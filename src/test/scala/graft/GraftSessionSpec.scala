package graft

import org.apache.spark.sql.functions._

class GraftSessionSpec extends SparkSpec {
  test("attach registers every graft function and the planner extension") {
    import spark.implicits._
    GraftSession.attach(spark)
    val one = Seq((Array(1.0f, 0.0f), "ab c")).toDF("v", "t")
    one.createOrReplaceTempView("gs_probe")
    val row = spark.sql(
      """SELECT graft_cosine(v, v) AS c, graft_polyhash(t) AS h,
        |       graft_lsh_bucket(v) AS b FROM gs_probe""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getLong(1) > 0)
    assert(row.getInt(2) >= 0 && row.getInt(2) < 256)
    assert(spark.sql("SELECT tokenize_pos(t) AS (p, tok) FROM gs_probe").count() === 2)
    assert(spark.sql("SELECT graft_topk_tokens(t) FROM gs_probe").count() === 1)
    assert(spark.sql("SELECT graft_weighted_sum(1.0, 2.0) FROM gs_probe").count() === 1)
    // the r9 attach additions: sketch builder/reader pair must round-trip
    // the sketch reader hashes UTF-8 bytes (StringType insertions), so
    // build the sketch over the string column itself
    val cms = spark.sql(
      """SELECT graft_cms_query(s, tv) AS est FROM (
        |  SELECT count_min_sketch(t, 0.001d, 0.99d, 1) AS s, min(t) AS tv
        |  FROM gs_probe)""".stripMargin).head()
    assert(cms.getLong(0) >= 1L, "CMS estimate is one-sided >= true count")
    val bloom = spark.sql(
      """SELECT graft_might_contain(
        |         (SELECT graft_bloom_agg(xxhash64(t), 100L, 8192L) FROM gs_probe),
        |         xxhash64(t)) AS hit FROM gs_probe""".stripMargin).head()
    assert(bloom.getBoolean(0), "bloom has no false negatives on a member")
    assert(spark.experimental.extraStrategies.nonEmpty)
  }

  test("registerTables exposes the full dataset to plain spark.sql") {
    GraftSession.registerTables(spark, TestSpark.sf0001)
    // a representative SQL-only query across three table kinds: relational,
    // events (ns-shimmed), documents
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS n FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(joined.count() === 5)
    assert(spark.sql("SELECT MAX(ts) FROM events").head().get(0) != null)
    assert(spark.sql("SELECT COUNT(*) FROM documents").head().getLong(0) > 0)
    assert(spark.sql("SELECT size(embedding) FROM embeddings LIMIT 1")
      .head().getInt(0) > 0)
  }

  test("registerTables fault isolation: one missing table cannot sink the other views") {
    // stage a dataset dir with events.parquet absent (the r7 failure mode
    // was a broken events loader taking down relational-only sql2 keys)
    val dir = java.nio.file.Files.createTempDirectory("graft_noevents")
    (Tables.relational ++ Seq("documents", "embeddings")).foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"${TestSpark.sf0001}/$t.parquet"))
    }
    try {
      val df = SparkEntry.queries("sql2_q1_text")(spark, dir.toString)
      assert(df.count() > 0, "relational SQL keys must run without the events table")
    } finally {
      // re-register the real dataset even on assertion failure, so later
      // suites sharing the session never see views pointed at the
      // events-less temp dir (cascading-failure guard)
      GraftSession.registerTables(spark, TestSpark.sf0001)
    }
  }
}
