package graft

import org.apache.spark.sql.functions._

/** Round-18 (optimization round 2) pins: the lowered regression-gate
  * absolute floor (r17 verdict #3 — 0.5 s hid every x50-class sub-floor
  * regression from the gate), the tail-safe headline's per-query map
  * (r17 verdict #2 — the driver's per-query parse had been dead since
  * r14), and widenIfStarved's scan-rooted precondition (r17 ADVICE #1 —
  * .rdd on a shuffle-containing frame runs jobs at construction time).
  */
class Round18Spec extends SparkSpec {

  test("regression gate floor is 0.15 s and catches an x50-shaped move") {
    assert(BenchGate.RegressFloorSec === 0.15)
    // the r17 shipped regression the old 0.5 s floor hid: 0.2 -> 0.45 s
    // (2.25x ratio, +0.25 s absolute) must now fire
    assert(BenchGate.regressedKeys(
      Map("x50_substring_dedup" -> 0.45),
      Map("x50_substring_dedup" -> 0.20)) === Seq("x50_substring_dedup"))
    // scheduler jitter on a sub-100 ms key must still NOT fire: doubling
    // 0.06 -> 0.14 is only +0.08 absolute
    assert(BenchGate.regressedKeys(
      Map("tiny_key" -> 0.14), Map("tiny_key" -> 0.06)).isEmpty)
  }

  test("headline queries map is compact 3-dp medians in sweep order") {
    val j = BenchGate.queriesJson(Seq("b_key", "a_key"),
      Map("a_key" -> 0.25, "b_key" -> 1.5))
    assert(j === """{"b_key":1.500,"a_key":0.250}""")
  }

  test("widenIfStarved rejects frames that are not scan/union-rooted") {
    // an aggregate below the probe would make .rdd materialize a shuffle
    // query stage at construction time — the guard must refuse loudly
    val agg = spark.range(0, 100, 1, 1).toDF("doc_id")
      .groupBy(col("doc_id")).count()
    intercept[IllegalArgumentException] {
      graft.queries.PipelineOps.widenIfStarved(agg, col("doc_id"))
    }
    // while narrow chains over a leaf stay accepted (identity or widen)
    val ok = graft.queries.PipelineOps.widenIfStarved(
      spark.range(0, 100, 1, 1).toDF("doc_id")
        .filter(col("doc_id") > 1).select(col("doc_id")),
      col("doc_id"))
    assert(ok.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }
}
