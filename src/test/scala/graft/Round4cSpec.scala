package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Round-4 session-3 additions: semantic invariants for the near-dup,
  * graph, quality, corpus-lifecycle, Q2-stress, URL, and quantization
  * keys added this session (x27–x37, q2e/q2f, f13, p1) — each test pins
  * a property the DuckDB hash-match alone can't see (losslessness of
  * blocking, rank-mass conservation, MERGE accounting, stride formulas,
  * error bounds).
  */
class Round4cSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("x27 simhash neardup: banding finds every injected exact twin at hamming 0") {
    val df = run("x27_simhash_neardup").cache()
    // every doc_id % 10 == 0 twin (same text => same fingerprint) must appear
    val twinIds = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 === 0)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val zeroPairs = df.filter(col("hamming") === 0)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twinIds.forall(id => zeroPairs.contains((id, id + 10000000L))),
      "some exact twin pair missing from the hamming-0 result")
    // threshold respected; pairs canonically ordered
    assert(df.filter(col("hamming") > 3 || col("hamming") < 0).count() === 0L)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() === 0L)
    df.unpersist()
  }

  test("x28 pagerank: every graph node ranked, ranks bounded and non-uniform") {
    val df = run("x28_pagerank").cache()
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).distinct().cache()
    val nParts = li.select("l_partkey").distinct().count()
    val nSupps = li.select("l_suppkey").distinct().count()
    assert(df.count() === nParts + nSupps)
    // damping floor: rank >= 0.15 in micro-units; dangling-free graph keeps
    // total mass near n * 1e6 (integer-division truncation loses a little)
    assert(df.filter(col("pr") < 150000L).count() === 0L)
    val total = df.agg(sum("pr")).first().getLong(0)
    val n = nParts + nSupps
    assert(total <= n * 1000000L && total > (n * 1000000L * 95) / 100)
    assert(df.select("pr").distinct().count() > 1, "ranks collapsed to uniform")
    li.unpersist(); df.unpersist()
  }

  test("x29 quality classifier: keep thresholds the score; model covers both classes") {
    val df = run("x29_quality_classifier").cache()
    assert(df.filter((col("score_sum") >= 0) =!= (col("keep") === 1)).count() === 0L)
    val kept = df.filter(col("keep") === 1).count()
    assert(kept > 0 && kept < df.count(), "classifier decision is degenerate")
    df.unpersist()
  }

  test("q2e: one output group per distinct composite key") {
    val df = run("q2e_substr_agg").cache()
    val distinctKeys = Tables.lineitem(spark, sf0001)
      .select(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))).distinct().count()
    assert(df.count() === distinctKeys)
    assert(df.filter(col("n_lines") < 1).count() === 0L)
    df.unpersist()
  }

  test("x30 upsert: MERGE semantics — delete class absent, statuses match change classes") {
    val df = run("x30_corpus_upsert").cache()
    val base = Tables.documents(spark, sf0001).select(col("doc_id")).cache()
    // deletes (doc_id % 7 == 1) are gone; no other base row is lost
    assert(df.filter(col("doc_id") % 7 === 1 && col("doc_id") < 7000000L).count() === 0L)
    val nBase = base.count()
    val nDel = base.filter(col("doc_id") % 7 === 1).count()
    val nIns = base.filter(col("doc_id") % 7 === 2).count()
    assert(df.count() === nBase - nDel + nIns)
    // status classes line up with the mod-7 feed
    assert(df.filter(col("status") === "updated").count() ===
      base.filter(col("doc_id") % 7 === 0).count())
    assert(df.filter(col("status") === "inserted").count() === nIns)
    assert(df.filter(col("status") === "inserted" && col("doc_id") < 7000000L).count() === 0L)
    base.unpersist(); df.unpersist()
  }

  test("p1 pipeline: every stage's invariant holds on the composed survivors") {
    val df = run("p1_curation_pipeline").cache()
    assert(df.count() > 0)
    // stage 3: per-source cap respected
    assert(df.groupBy("source").count().filter(col("count") > 10).count() === 0L)
    // stage 2: survivors all carry non-negative scores
    assert(df.filter(col("score_sum") < 0).count() === 0L)
    // stage 4: no two survivors share a text
    val texts = df.select("doc_id").join(Tables.documents(spark, sf0001), "doc_id")
      .select("text")
    assert(texts.count() === texts.distinct().count())
    // composition is strictly narrowing
    assert(df.count() < Tables.documents(spark, sf0001).count())
    df.unpersist()
  }

  test("x32 bigram coherence: df floor holds and score is content-determined") {
    val df = run("x32_bigram_coherence").cache()
    // every bigram's df counts at least its own document
    assert(df.filter(col("mean_df_milli") < 1000).count() === 0L)
    assert(df.filter(col("df_sum") < col("n_bigrams")).count() === 0L)
    // identical texts must get identical (n_bigrams, df_sum)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val scores = df.join(docs, "doc_id")
      .select(col("text"), col("n_bigrams"), col("df_sum")).distinct()
    assert(scores.count() === scores.select("text").distinct().count())
    df.unpersist()
  }

  test("x33 url dedup: canonicals are fully normalized and account for every doc") {
    val df = run("x33_url_dedup").cache()
    val total = df.agg(sum("n_variants")).first().getLong(0)
    assert(total === Tables.documents(spark, sf0001).count())
    val bad = df.filter(
      col("canonical").rlike("[A-Z]|#|utm_|:443") ||
        col("canonical").endsWith("/"))
    assert(bad.count() === 0L, "canonical form retains noise")
    // the synthesized variants really collapse (dedup does real work)
    assert(df.filter(col("n_variants") > 1).count() > 0)
    df.unpersist()
  }

  test("x34 cascade: exact twins verify at edit 0, perturbed twins at small positive edit") {
    val df = run("x34_editdist_verify").cache()
    // the injected exact twins (doc+10M) must verify with edit distance 0
    val exactPairs = df.filter(col("doc_b") >= 10000000L && col("doc_b") < 20000000L &&
      col("doc_b") - col("doc_a") === 10000000L)
    assert(exactPairs.count() > 0)
    assert(exactPairs.filter(col("edit") =!= 0).count() === 0L)
    // the ' extra'-appended twins that survive carry exactly that edit cost (6 chars)
    val perturbed = df.filter(col("doc_b") >= 20000000L &&
      col("doc_b") - col("doc_a") === 20000000L)
    assert(perturbed.filter(col("edit") =!= 6).count() === 0L)
    df.unpersist()
  }

  test("q2f: amplified grouping yields exactly 4 groups per distinct line key") {
    val df = run("q2f_substr_agg")
    val distinctKeys = Tables.lineitem(spark, sf0001)
      .select(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))).distinct().count()
    assert(df.count() === distinctKeys * 4)
  }

  test("x35 chunking: chunk counts follow the stride formula, windows capped at size") {
    val df = run("x35_chunking").cache()
    val perDoc = df.groupBy("doc_id").count()
    val expect = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 1)
      .withColumn("expect", expr("CAST((n - 1) div 24 AS LONG) + 1"))
    assert(perDoc.join(expect, "doc_id")
      .filter(col("count") =!= col("expect")).count() === 0L)
    assert(df.filter(col("n_tok") > 32 || col("n_tok") < 1).count() === 0L)
    df.unpersist()
  }

  test("x36 cluster histogram: accounts for every clustered doc, no singletons") {
    val hist = run("x36_cluster_hist").cache()
    val clustered = run("x15_dedup_clusters").count()
    val total = hist.agg(sum(col("cluster_size") * col("n_clusters"))).first().getLong(0)
    assert(total === clustered)
    assert(hist.filter(col("cluster_size") < 2).count() === 0L)
    hist.unpersist()
  }

  test("x37 int8 quantization: codes bounded at 127, error bounded by half a step") {
    val df = run("x37_quantize_int8").cache()
    assert(df.count() > 0)
    assert(df.filter(col("code_max") > 127).count() === 0L)
    // max reconstruction error <= scale/254 (half the quantization step),
    // +1 micro for the floor-snap of each side
    assert(df.filter(col("max_err_micro") > col("scale_micro") / 254 + 1).count() === 0L)
    df.unpersist()
  }

  test("f13 url: parse_url parts recompose into the synthesized url") {
    val df = run("f13_url").cache()
    assert(df.count() > 0)
    val bad = df.filter(
      !col("host").endsWith(".example.com") ||
        !col("path").startsWith("/docs/") ||
        !col("query").startsWith("lang=") ||
        (col("lang_param") =!= regexp_extract(col("query"), "lang=([^&]*)", 1)))
    assert(bad.count() === 0L)
    df.unpersist()
  }
}
