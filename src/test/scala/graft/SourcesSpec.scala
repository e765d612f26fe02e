package graft

import graft.sources.MultiFormat
import org.apache.spark.sql.functions._

/** Multi-format scan/sink parity: the reference's text / compressed-text /
  * container-format sweep, as Spark write→read roundtrips.
  */
class SourcesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$name").toString + "/data"

  test("csv roundtrip preserves rows and aggregates") {
    val p = tmp("csv")
    MultiFormat.write(docs.select("doc_id", "lang", "n_chars"), "csv", p, Some("gzip"))
    val back = MultiFormat.read(spark, "csv", p)
    assert(back.count() === docs.count())
    val a = back.agg(sum(back.columns(2))).head().getLong(0)
    val b = docs.agg(sum("n_chars")).head().getLong(0)
    assert(a === b)
  }

  test("json roundtrip preserves rows") {
    val p = tmp("json")
    MultiFormat.write(docs, "json", p, Some("gzip"))
    assert(MultiFormat.read(spark, "json", p).count() === docs.count())
  }

  test("parquet codec sweep: snappy, gzip, zstd all readable") {
    for (codec <- Seq("snappy", "gzip", "zstd")) {
      val p = tmp(codec)
      MultiFormat.write(docs, "parquet", p, Some(codec))
      assert(MultiFormat.read(spark, "parquet", p).count() === docs.count(), codec)
    }
  }

  test("src4 sequencefile roundtrip: snappy container, parquet-exact aggregate") {
    val got = MultiFormat.src4SequencefileScan(spark, TestSpark.sf0001).collect()
    val want = Tables.customer(spark, TestSpark.sf0001)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
           sum(expr("CAST(c_acctbal AS DECIMAL(18,2))")).cast("double").as("sum_acctbal"))
      .orderBy(col("c_nationkey")).collect()
    assert(got.sameElements(want))
    // the container really is a snappy SequenceFile: the header names the
    // codec class (SEQ magic + key/value classes + codec)
    val dir = new java.io.File(s"${Scratch.dir(spark)}/graft_src4_seq__root_testdata_sf0_001")
    val part = dir.listFiles().filter(_.getName.startsWith("part-")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(300)
    val headStr = new String(head.filter(b => b >= 32 && b < 127).map(_.toChar))
    assert(new String(head.take(3)) === "SEQ", "not a SequenceFile container")
    assert(headStr.contains("SnappyCodec"), s"codec missing from header: $headStr")
  }

  test("src5 shard sink: 8 sorted shard dirs, pruned single-shard read") {
    // run the key once to materialize the layout
    val got = MultiFormat.src5ShardSink(spark, TestSpark.sf0001)
    assert(got.count() > 0)
    val dir = new java.io.File(s"${Scratch.dir(spark)}/graft_src5_shard__root_testdata_sf0_001")
    val shards = dir.listFiles().filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shards.toSeq === (0 until 8).map(i => s"shard=$i"))
    // each shard holds one fully doc_id-sorted file (the training-reader
    // contract: open your slice, stream it in order)
    for (s <- Seq(0, 5)) {
      val rows = spark.read
        .parquet(s"${dir.getPath}/shard=$s").select("doc_id")
        .collect().map(_.getLong(0))
      assert(rows.sameElements(rows.sorted), s"shard $s not sorted")
    }
    // the single-shard filter prunes partitions at the scan
    val scan = MultiFormat.src5ShardSink(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(shard"),
      "shard filter must reach the scan as a partition filter")
  }

  test("src7 corrupt-record policy: PERMISSIVE quarantines, FAILFAST aborts") {
    // run the key once so the corrupted layout exists and counts line up
    val row = MultiFormat.src7CorruptScan(spark, TestSpark.sf0001).head()
    val nCorrupt = docs.filter(col("doc_id") % 50 === 0).count()
    assert(row.getLong(0) === docs.count() - nCorrupt)
    assert(row.getLong(1) === nCorrupt)
    // the SAME files under FAILFAST must abort the scan
    val tag = TestSpark.sf0001.replaceAll("[^a-zA-Z0-9]", "_")
    val path = s"${Scratch.dir(spark)}/graft_src7_corrupt_$tag"
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
        .option("mode", "FAILFAST").json(path).count()
    }
    assert(ex.getMessage.contains("FAILFAST") ||
      Option(ex.getCause).exists(_.getMessage.contains("FAILFAST")))
  }

  test("src8 compaction collapses the fragmented layout to size-targeted files") {
    MultiFormat.src8Compaction(spark, TestSpark.sf0001).collect() // build layouts
    val tag = TestSpark.sf0001.replaceAll("[^a-zA-Z0-9]", "_")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val frag = parts(s"${Scratch.dir(spark)}/graft_src8_frag_$tag")
    val comp = parts(s"${Scratch.dir(spark)}/graft_src8_comp_$tag")
    assert(frag === 64, s"fragmented layout should have 64 files, had $frag")
    assert(comp < frag / 8, s"compaction left $comp files (from $frag)")
    // row-level content identical across the re-layout
    val a = spark.read.parquet(s"${Scratch.dir(spark)}/graft_src8_frag_$tag")
    val b = spark.read.parquet(s"${Scratch.dir(spark)}/graft_src8_comp_$tag")
    assert(a.count() === b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("documents-as-text-lines: reference Q4 input shape") {
    val p = tmp("text")
    MultiFormat.write(docs.select("text"), "text", p, Some("gzip"))
    val wc = MultiFormat.wordcountOverLines(spark, p)
    // token totals must match the parquet-sourced q4 pipeline
    val fromParquet = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").count()
    assert(wc.agg(sum("cnt")).head().getLong(0) === fromParquet)
  }
}
