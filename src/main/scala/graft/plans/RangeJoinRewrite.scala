package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Flag-gated bucketed-range-join rewrite — the optimizer-rule form of
  * what `operators.RangeJoin.pointInInterval` (and j6) does by hand.
  *
  * An interval join with no equi-key (`p BETWEEN lo AND hi`) plans as
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons, the classic 100 TB
  * cliff. With `spark.graft.rangeJoin.bucket = <width>` set, this rule
  * rewrites any such inner join into an equi-join on a derived bucket:
  * the point side computes `floor(p / w)`, the interval side explodes
  * `sequence(floor(lo/w), floor(hi/w))`, and the original predicate stays
  * as the residual — identical semantics (each point matches an interval
  * in exactly one bucket, its own, so no duplicates; null bounds drop on
  * both paths), but the join partitions by bucket and scales linearly.
  * The same trade Databricks' range-join hint implements; here it is a
  * plain `Rule[LogicalPlan]` over public Catalyst nodes.
  *
  * Guards: inner joins only; fires only when NO equi-conjunct already
  * spans the sides (if one exists Spark hash-joins fine without help —
  * and the guard also stops the rule re-firing on its own output, whose
  * bucket equality is exactly such a conjunct); bounds and point must be
  * integral (int/long — µs timestamps arrive as longs); width must come
  * from the flag because bucket choice is a data-dependent tuning knob
  * (≈ the typical interval length; see RangeJoin's scaladoc).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val Flag = "spark.graft.rangeJoin.bucket"

  /** Per-row ceiling on how many buckets one interval may explode into
    * (count, endpoints inclusive — the guard admits span + 1 <= maxSpan).
    * An interval row that would materialize more raises a CLEAR error
    * naming both confs (instead of `Sequence`'s opaque max-array failure
    * deep in execution, or — worse — a silent drop): a span that large
    * means the bucket width is mis-tuned for the data (e.g. an open-ended
    * `hi = Long.MaxValue` sentinel row), and the fix is the user's call —
    * raise the width, pre-filter sentinels, or unset the flag and take
    * the nested-loop plan. Default 1M buckets = an 8 MB array per row,
    * already past any sane width choice.
    */
  val MaxSpanFlag = "spark.graft.rangeJoin.maxSpan"
  val DefaultMaxSpan = 1L << 20

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Floor-division bucket, exact for any sign and for the FULL long
    * domain: truncating div, shifted down one for negative non-exact
    * quotients. No arithmetic on `p` itself (the previous
    * `p - pmod(p, w)` underflowed for p within w of Long.MinValue, and
    * with ANSI off the wrapped bucket silently disagreed with the
    * interval side's — dropping matches the residual can't recover).
    */
  private def bucket(e: Expression, w: Long): Expression = {
    val p = asLong(e)
    val tdiv = IntegralDivide(p, Literal(w))
    val rem = Remainder(p, Literal(w))
    If(And(LessThan(p, Literal(0L)), Not(EqualTo(rem, Literal(0L)))),
      Subtract(tdiv, Literal(1L)), tdiv)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = try conf.getConfString(Flag, "0").toLong catch {
      case _: NumberFormatException => 0L
    }
    if (w <= 0) return plan
    plan.transformDown {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(l, r, cond, hint, w).getOrElse(j)
    }
  }

  /** Which side of the join an expression's references live on entirely:
    * Some(true)=left, Some(false)=right, None=neither/both/empty.
    */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.subsetOf(r.outputSet)) Some(false)
    else None

  private def rewrite(l: LogicalPlan, r: LogicalPlan, cond: Expression,
                      hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val crossEqui = conjuncts.exists {
      case Equality(a, b) =>
        (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r)) yield sa != sb)
          .getOrElse(false)
      case _ => false
    }
    if (crossEqui) return None

    // normalize every inequality conjunct to (big, small): big >= small
    val ineqs = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b)        => (a, b)
      case LessThanOrEqual(a, b)    => (b, a)
      case LessThan(a, b)           => (b, a)
    }
    // lower bound p >= lo with p and lo on opposite sides, then an upper
    // bound hi >= p for the semantically-same p with hi beside lo
    val matched = (for {
      (p, lo) <- ineqs.iterator
      if integral(p) && integral(lo)
      pSide <- sideOf(p, l, r).iterator
      loSide <- sideOf(lo, l, r).iterator
      if pSide != loSide
      (hi, p2) <- ineqs.iterator
      if p2.semanticEquals(p) && integral(hi) &&
        sideOf(hi, l, r).contains(loSide)
    } yield (p, lo, hi, pSide)).take(1).toSeq.headOption

    matched.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan, intervalPlan) = if (pointOnLeft) (l, r) else (r, l)
      val pBucket = Alias(bucket(p, w), "__graft_pbucket")()
      val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)
      val loB = bucket(lo, w)
      val hiB = bucket(hi, w)
      val emptySeq = Literal.create(Array.empty[Long], ArrayType(LongType, false))
      val maxSpan = try conf.getConfString(MaxSpanFlag, DefaultMaxSpan.toString)
        .toLong catch { case _: NumberFormatException => DefaultMaxSpan }
      // TryEval: with ANSI on (the Spark 4 default) a bounds pair
      // straddling the long range would make the subtraction ITSELF throw
      // the generic overflow error before our check runs — TryEval turns
      // that into null, the null predicate routes to the false branch, and
      // the user still gets the actionable over-span message. With ANSI
      // off the wrapped value is negative and the >= 0 check catches it.
      val span = TryEval(Subtract(hiB, loB))
      // the sequence materializes span + 1 buckets (both endpoints
      // inclusive), so admit strictly-less-than: spanOk ⇒ bucket count
      // span + 1 <= maxSpan, matching the message and the flag's meaning
      val spanOk = And(GreaterThanOrEqual(span, Literal(0L)),
        LessThan(span, Literal(maxSpan)))
      // Coalesce: when Subtract itself overflowed, TryEval made span null,
      // which would null the Cast, null the Concat, and reduce raise_error
      // to a generic message — the fallback literal keeps the actionable
      // conf-naming text on that route too. The +1 (bucket count, not
      // index span) is TryEval'd for the span == Long.MaxValue edge.
      val bucketCount = Coalesce(Seq(
        Cast(TryEval(Add(span, Literal(1L))),
          org.apache.spark.sql.types.StringType),
        Literal("(overflowed)")))
      val overspan = Cast(new RaiseError(Concat(Seq(
        Literal("graft range-join rewrite: interval materializes "),
        bucketCount,
        Literal(s" buckets > $MaxSpanFlag=$maxSpan (open-ended sentinel " +
          s"bound, or $Flag width mis-tuned for the data); raise the " +
          "width, pre-filter sentinel rows, or unset the flag for the " +
          "nested-loop plan")))),
        ArrayType(LongType, false))
      // guard inverted intervals: sequence(start > stop, step 1) throws at
      // runtime, where the original join just matched nothing. The zone
      // must be set by hand — analyzer-time ResolveTimeZone has already
      // run, and a zoneless Sequence leaves the plan unresolved.
      val seq = If(LessThanOrEqual(loB, hiB),
        If(spanOk,
          new Sequence(loB, hiB, Literal(1L))
            .withTimeZone(conf.sessionLocalTimeZone),
          overspan),
        emptySeq)
      val rBucket = AttributeReference("__graft_rbucket", LongType, nullable = false)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(rBucket), child = intervalPlan)
      val newCond = And(EqualTo(pBucket.toAttribute, rBucket), cond)
      val (nl, nr) = if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
      Project(l.output ++ r.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}
