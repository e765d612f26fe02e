package graft

import graft.TestSpark._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Engine-wide invariants over EVERY declared key, not a sampled few:
  *
  *  1. Builder laziness — after fixtures exist, re-building any declared
  *     query runs ZERO Spark jobs. Query construction is plan authoring;
  *     driver-side actions at build time serialize the driver at 1000
  *     executors (the r5-verdict x9 wart, generalized to the whole map).
  *  2. No cartesian anywhere — no physical plan contains a
  *     CartesianProduct or an un-keyed BroadcastNestedLoopJoin. Every
  *     join in the library must carry equi-keys (or be rewritten to, as
  *     j4/j10 are); an accidental cross product is the classic
  *     silent 100 TB scale-killer.
  *  3. Oracle completeness — every declared key carries a DuckDB oracle
  *     unless it is on the explicit no-oracle list (approx sketches whose
  *     bounds SketchSpec pins). A key that silently loses its oracle
  *     drops out of the correctness gate without anyone noticing.
  */
class AuditSpec extends SparkSpec {

  test("every declared key has an oracle or is explicitly declared no-oracle") {
    // every key is oracle-checked since r8 (a1b/a5 use exact-wrapper oracles)
    val noOracle = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracle
    assert(missing.isEmpty, s"keys missing an oracle: ${missing.toSeq.sorted}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.toSeq.sorted}")
  }

  test("all builders are action-free on re-build, and no plan has a cartesian") {
    // pass 1: construct every key once — fixture-backed keys (src*, j8,
    // x39, x21/x36's label table, ...) materialize their stamped layouts
    // here, which is their documented one-time cost per corpus snapshot
    val keys = SparkEntry.queries.keys.toSeq.sorted
    keys.foreach { k => SparkEntry.queries(k)(spark, sf0001) }

    // pass 2: re-build all keys under a job counter — the whole map must
    // author plans without running anything
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plans = keys.map { k =>
        k -> SparkEntry.queries(k)(spark, sf0001).queryExecution.sparkPlan.toString
      }
      // listener delivery is async; one drain window covers all keys
      Thread.sleep(1500)
      assert(jobs.get() === 0,
        s"${jobs.get()} job(s) ran while re-building the ${keys.size}-key map — " +
          "some builder is eager (bisect by constructing halves under the listener)")
      val cartesian = plans.filter { case (_, p) => p.contains("CartesianProduct") }
      assert(cartesian.isEmpty,
        s"unbroadcast cartesian products in: ${cartesian.map(_._1)}")
      // BroadcastNestedLoopJoin is legitimate ONLY when the broadcast side
      // is bounded-constant by construction: a single-row corpus stat (x9's
      // in-plan scalar, x19's avgdl), a k-row centroid/pivot table (IVF
      // assignment in x12/x12b/x41), or the declared handful of query
      // vectors in the exact brute-force baselines (x1b, x40's ground-truth
      // side). Pin the exact key set: a NEW nested-loop join — which at
      // 100 TB means an unbounded broadcast — must trip this audit and
      // argue its bound here.
      // x12c/x41b left this set when trainedAssignShared materialized the
      // Lloyd pass: their plans now read the published assignment parquet
      // instead of carrying the 16-row centroid broadcast subtree
      val boundedBnlj = Set("x9_ngram_jaccard", "x19_bm25", "x12_ann_ivf",
        "x12b_ann_ivf8",
        "x41_semantic_dedup", "x1b_knn", "x40_ann_recall",
        "x43b_pq_adc", "x44_ivfpq_topk", // exact ground-truth side: 10-query broadcast panel
        "x45_hybrid_rrf", // dense side: single-row query-vector broadcast (x1b's shape)
        "x51_heavy_hitters", // two single-row broadcasts: CMS bytes + total count
        "x52_ndcg", // x1b's 10-query ground-truth panel + x12c's 16-centroid broadcast
        "x48_epoch_shuffle", // 3-row epoch table broadcast (ShufEpochs constant)
        "x55_pmi_collocations", // single-row total-token-count broadcast (x19's avgdl shape)
        "x64_triangle_count", // two single-row global aggregates cross-joined (edge count × wedge/triangle counts)
        "e8_rfm_segments", // single-row corpus-max-day watermark broadcast (x19's avgdl shape)
        "x70_bpe_merges", // per-iteration argmax merge rule: 1-row TakeOrdered (LIMIT 1) broadcast, 3 of them
        "x71_bpe_apply", // same 1-row merge-rule broadcasts as x70 (shared training loop)
        "x68c_also_bought_recall", // two single-row count aggregates cross-joined per scope row (x64's shape)
        // x73_kcore_peel left this set in r13: per-round stats now read ONE
        // aggregate over the next round's degree table (no crossJoin)
        "x74_tfidf_topk", // single-row doc-count broadcast into the scoring join (x19's stats shape)
        "x80_ann_graph_beam", // nlist-row centroid-table and 1-row entry broadcasts (x12's bound; nlist is the quantizer knob, never corpus-sized)
        "x81_selector_train", // 1-row trained-model broadcast (6 longs) + 1-row n_err aggregate
        "x81b_selector_score", // the same 1-row model broadcast against the scoring scan
        "x81c_selector_eval", // same model broadcast feeding the confusion aggregate
        "p6_learned_curation", // x81b's model broadcast inside the composed curation chain
        "x81d_selector_curve", // model broadcast + the 10-row threshold-grid broadcast into the conditional-count pass
        "x82_margin_mining") // cross-side cosine block: both sides pinned to MineBlock (x1c's absolute-constant doctrine), B-side broadcast
      val bnlj = plans.collect {
        case (k, p) if p.contains("BroadcastNestedLoopJoin") => k
      }.toSet
      assert(bnlj == boundedBnlj,
        s"nested-loop join set drifted: unexpected=${(bnlj -- boundedBnlj).toSeq.sorted} " +
          s"vanished=${(boundedBnlj -- bnlj).toSeq.sorted}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
