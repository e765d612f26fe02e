package graft

import org.apache.spark.sql.functions._

/** Round-9 pins: trained IVF centroids and the conf-driven semantic-dedup
  * cell count (r8 verdict item 2 — the hardcoded `ivfAssign(16)`).
  */
class Round9Spec extends SparkSpec {

  test("x41 cell count follows spark.graft.semdedup.cells") {
    val d = TestSpark.sf0001
    try {
      spark.conf.set("spark.graft.semdedup.cells", "4")
      val c4 = graft.queries.PipelineOps.x41SemanticDedup(spark, d)
      // cluster ids are pivot vec_ids, so every cluster label < cells
      assert(c4.agg(max(col("cluster"))).head().getLong(0) < 4L)
    } finally spark.conf.unset("spark.graft.semdedup.cells")
    val c16 = graft.queries.PipelineOps.x41SemanticDedup(spark, d)
    assert(c16.agg(max(col("cluster"))).head().getLong(0) >= 4L,
      "default 16 cells must use pivot ids the 4-cell run cannot")
  }

  test("Lloyd training moves assignments and does not hurt recall") {
    val d = TestSpark.sf0001
    val recall = graft.queries.PipelineOps.x40AnnRecall(spark, d)
      .select(col("method"), col("recall_pct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(recall.contains("ivf16t"), "trained row must be declared")
    // training refines cells toward density: recall of the probe set must
    // not degrade vs the same cell count untrained (at sf0.001 it jumps)
    assert(recall("ivf16t") >= recall("ivf16"),
      s"trained recall ${recall("ivf16t")} < untrained ${recall("ivf16")}")
  }
}
