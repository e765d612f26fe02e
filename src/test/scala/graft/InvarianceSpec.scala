package graft

import graft.TestSpark._

/** Physical-plan-knob invariance: results must not depend on adaptive
  * execution being on (the default) or off — AQE re-plans shuffles,
  * coalesces partitions, and switches join strategies at runtime, and a
  * query whose OUTPUT changes under any of that has an order- or
  * partitioning-dependence bug. Exercised on the shuffle-heaviest new
  * keys (banded self-join, iterative joins, high-cardinality agg,
  * composed multi-window pipeline); the thread-count sweep in the verify
  * loop covers the same property for the rest of the surface.
  */
class InvarianceSpec extends SparkSpec {

  private val keys = Seq("x27_simhash_neardup", "x28_pagerank",
    "q2e_substr_agg", "p1_curation_pipeline",
    // round 5: the 10⁷-group two-level agg, the RANGE-frame window, and
    // the Expand-based multi-distinct — each a distinct physical shape
    // AQE re-plans (coalesced final agg, windowed sort, expanded shuffle)
    "q2g_substr_agg", "w5_range_frame", "a8_multi_distinct",
    // round 9: double-window + shared-exchange agg, broadcast-banded
    // asymmetric near-dup join, and the two-level sketch union — register
    // maxima must make the merged estimate partition-plan independent
    "x57_session_sequences", "x58_fuzzy_decontam", "a9_hll_merge")

  test("AQE on/off produces byte-identical results on shuffle-heavy keys") {
    for (k <- keys) {
      val on = SparkEntry.queries(k)(spark, sf0001).collect()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val off = SparkEntry.queries(k)(spark, sf0001).collect()
        assert(on.length === off.length, s"$k row count differs under AQE off")
        assert(on.sameElements(off), s"$k rows differ under AQE off")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
