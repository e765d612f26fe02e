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
