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

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Floor-division bucket, exact for any sign: subtract the non-negative
    * pmod first so the integral divide is a true floor, not a truncation.
    */
  private def bucket(e: Expression, w: Long): Expression = {
    val p = asLong(e)
    IntegralDivide(Subtract(p, Pmod(p, Literal(w))), Literal(w))
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
      // guard inverted intervals: sequence(start > stop, step 1) throws at
      // runtime, where the original join just matched nothing. The zone
      // must be set by hand — analyzer-time ResolveTimeZone has already
      // run, and a zoneless Sequence leaves the plan unresolved.
      val seq = If(LessThanOrEqual(loB, hiB),
        new Sequence(loB, hiB, Literal(1L))
          .withTimeZone(conf.sessionLocalTimeZone),
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
