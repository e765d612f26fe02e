package graft.plans

import graft.functions.VectorCosine
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Whole-operator Catalyst extension for exact cosine top-k pairs.
  *
  * The declarative form a user writes (and PipelineOps.x1 declares) is a
  * self-join + cosine + ORDER BY sim LIMIT k — which Spark would execute as
  * a nested-loop join materializing all N²/2 pairs, then a TakeOrdered.
  * This module swaps in a broadcast-index physical operator:
  *
  *   logical  `CosineTopK`      — carries k + the original output attrs
  *   rule     `CosineTopKRewrite` — pattern-matches the optimized
  *            Limit(Sort(Project(Join(a, b, a.id < b.id)))) tree with a
  *            `round(graft_cosine(...), 6)` projection over two scans of
  *            the SAME source, and collapses it to the logical node.
  *            Guards on id:LongType and embedding:array<float> — any other
  *            types fall back to the (safe) declarative plan.
  *   strategy `CosineTopKStrategy` — plans the physical operator
  *   physical `CosineTopKExec`  — block-partitioned pairwise: rows are
  *            hashed into B = O(√parallelism) blocks, each unordered block
  *            pair (i ≤ j) becomes one shuffle task that computes its cross
  *            pairs under a bounded k-heap, and the B(B+1)/2 heaps shuffle
  *            to a single k-row reduce. NO driver materialization — per-task
  *            memory is two blocks (≈ 2N/B rows), which shrinks as the
  *            cluster (and hence B) grows; total work stays the exact N²/2
  *            pair kernel, spread evenly across tasks.
  *
  * If the pattern doesn't match (different rounding, different order, ...)
  * nothing rewrites and the declarative plan runs as-is — the rewrite is a
  * pure performance substitution, never a semantics change.
  *
  * Registered at runtime through `spark.experimental` (works on any live
  * session, e.g. the driver-built Verify/Bench sessions) and available as a
  * `SparkSessionExtensions` installer for `spark.sql.extensions` users.
  */
case class CosineTopK(
    k: Int,
    scale: Int,
    override val output: Seq[Attribute],
    idOrdinal: Int,
    embOrdinal: Int,
    child: LogicalPlan) extends UnaryNode {
  override def maxRows: Option[Long] = Some(k.toLong)
  override protected def withNewChildInternal(newChild: LogicalPlan): CosineTopK =
    copy(child = newChild)
}

object CosineTopKRewrite extends Rule[LogicalPlan] {

  private object Lit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case orig @ GlobalLimit(Lit(k), LocalLimit(_,
        Sort(sortOrder, true,
          Project(projList, Join(left, right, Inner, Some(cond), _)), _))) =>
      rewrite(k, sortOrder, projList, cond, left, right).getOrElse(orig)
    // count()-shaped variant (r17): under an aggregate-only consumer
    // (`df.count()` — the bench's timed action) ColumnPruning interposes a
    // narrowing Project (empty, for count) between the limit and the sort,
    // which broke the pattern above — so the bench was timing the
    // BroadcastNestedLoopJoin FALLBACK (measured 1.86 s single-task at
    // sf0.1) while Verify ran the fused operator. Tolerate any
    // attribute-only subset Project: rewrite beneath it, and re-project
    // the fused operator's output above.
    case orig @ GlobalLimit(Lit(k), LocalLimit(_, Project(keep,
        Sort(sortOrder, true,
          Project(projList, Join(left, right, Inner, Some(cond), _)), _))))
        if keep.forall {
          case _: Attribute => true
          case Alias(_: Attribute, _) => true
          case _ => false
        } =>
      rewrite(k, sortOrder, projList, cond, left, right)
        .map(topk => Project(keep, topk)).getOrElse(orig)
  }

  private def rewrite(
      k: Int,
      sortOrder: Seq[SortOrder],
      projList: Seq[NamedExpression],
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[LogicalPlan] = {
    // both join sides must be the same scan (self-join)
    if (left.canonicalized != right.canonicalized) return None
    // condition: idA < idB, one attribute from each side
    val (idA, idB) = cond match {
      case LessThan(a: Attribute, b: Attribute)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
      case _ => return None
    }
    // the exec reads ids with getLong and embeddings with getFloat — any
    // other types must fall back to the declarative plan, not crash
    if (idA.dataType != LongType || idB.dataType != LongType) return None
    def isFloatArray(a: Attribute): Boolean = a.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // projection: [idA as vec_a, idB as vec_b, round(cosine(embA, embB), s)
    // as sim] — ANY literal scale in [0, 9] plans the fused operator (the
    // exec's rounding and its fast-path margin are parameterized on it);
    // out-of-range scales fall back to the declarative plan
    val (simAlias, scale) = projList.collectFirst {
      case al @ Alias(Round(VectorCosine(ea: Attribute, eb: Attribute), Lit(sc), _), _)
          if sc >= 0 && sc <= 9 &&
             left.outputSet.contains(ea) && right.outputSet.contains(eb) &&
             isFloatArray(ea) && isFloatArray(eb) => (al, sc)
    }.getOrElse(return None)
    // the exec emits rows as (idA, idB, sim) — require the projection in
    // exactly that order so output attributes line up positionally
    def projects(ne: NamedExpression, target: Attribute): Boolean = ne match {
      case Alias(a: Attribute, _) => a.semanticEquals(target)
      case a: Attribute => a.semanticEquals(target)
      case _ => false
    }
    if (projList.size != 3 || !projects(projList(0), idA) ||
        !projects(projList(1), idB) || (projList(2) ne simAlias)) return None
    // sort: sim DESC first (id tie-breaks assumed from the declared shape)
    sortOrder.headOption match {
      case Some(SortOrder(e, Descending, _, _)) if e.semanticEquals(simAlias.toAttribute) => ()
      case _ => return None
    }
    val emb = simAlias.child.asInstanceOf[Round].child.asInstanceOf[VectorCosine]
      .left.asInstanceOf[Attribute]
    val idOrdinal = left.output.indexWhere(_.exprId == idA.exprId)
    val embOrdinal = left.output.indexWhere(_.exprId == emb.exprId)
    if (idOrdinal < 0 || embOrdinal < 0) return None
    // output attrs in the project's order, with the project's exprIds
    val out = projList.map(_.toAttribute)
    Some(CosineTopK(k, scale, out, idOrdinal, embOrdinal, left))
  }
}

object CosineTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CosineTopK(k, scale, out, idOrd, embOrd, child) =>
      CosineTopKExec(k, scale, out, idOrd, embOrd, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class CosineTopKExec(
    k: Int,
    scale: Int,
    override val output: Seq[Attribute],
    idOrdinal: Int,
    embOrdinal: Int,
    child: SparkPlan) extends UnaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val sc = scale
    // half of the rounding grid at this scale: anything further below the
    // kept worst can't displace it even after rounding up (fast-path bound)
    val halfGrid = 0.5 * math.pow(10.0, -sc)
    val idOrd = idOrdinal
    val embOrd = embOrdinal
    // NaN sims (zero-norm vectors) must rank HIGHEST — Spark's descending
    // sort orders NaN above every double, so the declarative plan lists NaN
    // pairs first and this exec must agree. rank() maps NaN to +Inf for
    // ordering while the emitted sim stays NaN.
    def rank(s: Double): Double = if (s.isNaN) Double.PositiveInfinity else s
    val worstFirst: Ordering[(Double, Long, Long)] =
      Ordering.by(t => (-rank(t._1), t._2, t._3))

    // 1. Extract (id, vec, norm) once, copying out of the reused UnsafeRow.
    val data: RDD[(Long, Array[Float], Double)] =
      child.execute().mapPartitions { it =>
        it.map { row =>
          val arr = row.getArray(embOrd)
          val v = new Array[Float](arr.numElements())
          var i = 0
          while (i < v.length) { v(i) = arr.getFloat(i); i += 1 }
          var n = 0.0; i = 0
          while (i < v.length) { val x = v(i).toDouble; n += x * x; i += 1 }
          (row.getLong(idOrd), v, math.sqrt(n))
        }
      }

    // 2. Hash rows into B = O(√parallelism) blocks; replicate each row to
    //    the B block-pair tasks its block participates in. Shuffle volume is
    //    B×N rows (√P replication — the standard block-matrix trade), and
    //    per-task memory is two blocks, independent of total N for a fixed
    //    cluster and shrinking as the cluster grows.
    val nBlocks = math.max(1,
      math.ceil(math.sqrt(2.0 * sparkContext.defaultParallelism)).toInt)
    val nTasks = nBlocks * (nBlocks + 1) / 2
    val replicated = data.flatMap { case t @ (id, _, _) =>
      val b = (java.lang.Long.hashCode(id) & Int.MaxValue) % nBlocks
      (0 until nBlocks).iterator.map { j =>
        (if (b <= j) (b, j) else (j, b), (b, t))
      }
    }

    // 3. One task per unordered block pair (i ≤ j): exact pairwise kernel
    //    under a bounded k-heap. Every global pair {a,b} lands in exactly
    //    one task (the one keyed by its two blocks), so work is the exact
    //    N²/2 kernel with no duplication.
    val heaps = replicated.groupByKey(new HashPartitioner(nTasks))
      .mapPartitions { tasks =>
        val heap = scala.collection.mutable.PriorityQueue
          .empty[(Double, Long, Long)](worstFirst)
        tasks.foreach { case ((bi, bj), rows) =>
          def offer(sim: Double, a: Long, b: Long): Unit = {
            // fast path: rounded(sim) <= sim + halfGrid, so anything more
            // than half a rounding grid below the kept worst can't displace
            // it — skip the (allocating) BigDecimal round for ~all pairs. NaN
            // always enters (it ranks highest, and BigDecimal would throw).
            if (heap.size < kk || sim.isNaN ||
                sim >= rank(heap.head._1) - halfGrid) {
              val simR = if (sim.isNaN) sim
                else new JBigDecimal(sim)
                  .setScale(sc, RoundingMode.HALF_UP).doubleValue()
              val cand = (simR, math.min(a, b), math.max(a, b))
              if (heap.size < kk) heap.enqueue(cand)
              else if (worstFirst.compare(cand, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(cand)
              }
            }
          }
          def cosine(x: (Long, Array[Float], Double),
                     y: (Long, Array[Float], Double)): Double = {
            val vX = x._2; val vY = y._2
            var dot = 0.0; var i = 0
            while (i < vX.length) { dot += vX(i).toDouble * vY(i).toDouble; i += 1 }
            dot / (x._3 * y._3)
          }
          if (bi == bj) {
            val block = rows.iterator.map(_._2).toArray
            var i = 0
            while (i < block.length) {
              var j = i + 1
              while (j < block.length) {
                // the declarative form joins on idA < idB: equal ids (which
                // always co-hash to one block) must not pair with themselves
                if (block(i)._1 != block(j)._1)
                  offer(cosine(block(i), block(j)), block(i)._1, block(j)._1)
                j += 1
              }
              i += 1
            }
          } else {
            val left = rows.iterator.filter(_._1 == bi).map(_._2).toArray
            val right = rows.iterator.filter(_._1 == bj).map(_._2).toArray
            var i = 0
            while (i < left.length) {
              var j = 0
              while (j < right.length) {
                offer(cosine(left(i), right(j)), left(i)._1, right(j)._1)
                j += 1
              }
              i += 1
            }
          }
        }
        heap.iterator
      }

    // 4. Global reduce: at most nTasks×k tuples shuffle to one task (a real
    //    shuffle, not coalesce — the heap stage keeps its parallelism).
    heaps.repartition(1).mapPartitions { it =>
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      it.toArray.sorted(worstFirst).take(kk).iterator.map { case (sim, a, b) =>
        proj(InternalRow(a, b, sim))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): CosineTopKExec =
    copy(child = newChild)
}

/** Runtime + builder-time registration. */
object GraftPlanner {
  /** Idempotently install the graft rules/strategies on a live session —
    * works on driver-built sessions where spark.sql.extensions wasn't set.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(CosineTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CosineTopKRewrite
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(NarrowGroupKeyRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NarrowGroupKeyRewrite
    if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineTopKStrategy
  }
}
