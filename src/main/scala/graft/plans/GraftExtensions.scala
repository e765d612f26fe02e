package graft.plans

import graft.functions.{StringPolyHash, TokenizePos, VectorCosine, VectorLshBucket}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Builder-time registration for sessions the library owner constructs:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Injects the CosineTopK optimizer rule + planner strategy and registers
  * the graft expression functions in the session catalog. For sessions
  * built elsewhere (the driver's Verify/Bench), `GraftPlanner.install` +
  * the per-function `register` helpers do the same at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CosineTopKRewrite)
    // flag-gated (spark.graft.approxDistinct) — a no-op unless opted in
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
    // flag-gated (spark.graft.rangeJoin.bucket) — a no-op unless opted in
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    // flag-gated (spark.graft.narrowGroupKey) — a no-op unless opted in
    e.injectOptimizerRule(_ => NarrowGroupKeyRewrite)
    e.injectPlannerStrategy(_ => CosineTopKStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[StringPolyHash].getName, "graft_polyhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        StringPolyHash(exprs.head, StringPolyHash.DefaultMod)))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorCosine].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorCosine(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[VectorLshBucket].getName, "graft_lsh_bucket"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorLshBucket(exprs.head, 8)))
    e.injectFunction((
      FunctionIdentifier("tokenize_pos"),
      new ExpressionInfo(classOf[TokenizePos].getName, "tokenize_pos"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenizePos(exprs.head)))
  }
}
