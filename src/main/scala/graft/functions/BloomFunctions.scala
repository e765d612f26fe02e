package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL handles for Spark's OWN runtime-filter bloom expressions —
  * `BloomFilterAggregate` (builds the filter over the small side) and
  * `BloomFilterMightContain` (probes it on the big side). These are the
  * exact expressions Catalyst's `InjectRuntimeFilter` rule plants under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`; registering them as
  * functions lets an operator DECLARE the pruning instead of hoping the
  * injection heuristics (join-type, selectivity, size thresholds) fire.
  * `graft_might_contain`'s filter argument must be a scalar subquery (or
  * constant) — Spark enforces this, which is what makes the pattern safe:
  * the filter is computed once, broadcast as a literal, and probed
  * map-side with no join in the plan.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
