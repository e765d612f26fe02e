package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Corpus-assembly operators (x23–x26) and the recursive-CTE key (f12):
  * invariants the DuckDB hash-compare can't express — conservation laws,
  * cap bounds, temperature-reweighting direction, recursion shape.
  */
class CorpusOpsSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("x23 packing conserves docs and respects the per-sequence budget") {
    val total = Tables.documents(spark, sf0001).count()
    val packed = run("x23_pack_shards").cache()
    assert(packed.agg(sum("n_docs")).first().getLong(0) === total)
    // a bin holds at most budget + one straddling doc's tokens (docs are
    // <= 99 tokens in this fixture, far under the 512 budget)
    val maxDoc = Tables.documents(spark, sf0001)
      .select(size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").as("n"))
      .agg(max("n")).first().getLong(0)
    assert(packed.filter(col("sum_toks") > lit(512L + maxDoc)).count() === 0L)
    // within each shard, seq ids are contiguous from 0 (no doc exceeds
    // the budget, so no bin can be skipped)
    val bad = packed.groupBy("shard")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(bad.count() === 0L)
    packed.unpersist()
  }

  test("x24 temperature sampling flattens the head relative to natural share") {
    val rows = run("x24_mixture_sample").collect()
    assert(rows.length > 1)
    val byLang = rows.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // rates are valid probabilities in per-myriad units; sampling never
    // exceeds the stratum
    assert(byLang.forall { case (_, n, rate, sampled) =>
      rate >= 0 && rate <= 10000 && sampled <= n })
    // alpha=0.5 compresses the spread: the head/tail RATE ratio must sit
    // strictly below the head/tail COUNT ratio (that's what temperature
    // reweighting is for)
    val head = byLang.maxBy(_._2)
    val tail = byLang.minBy(_._2)
    assert(head._2 > tail._2, "fixture should have a skewed lang mix")
    assert(head._3.toDouble / tail._3 < head._2.toDouble / tail._2)
  }

  test("x25 finds the synthesized PII in every doc and redaction shrinks text") {
    val df = run("x25_pii_scan").cache()
    assert(df.count() === Tables.documents(spark, sf0001).count())
    assert(df.filter(col("n_email") < 1 || col("n_ipv4") < 1 ||
      col("n_longnum") < 1).count() === 0L)
    // every synthesized email is longer than the <EMAIL> placeholder
    assert(df.filter(col("redact_delta") <= 0).count() === 0L)
    df.unpersist()
  }

  test("x26 caps every source and keeps exactly min(cap, source size)") {
    val kept = run("x26_cap_per_source").cache()
    val sizes = Tables.documents(spark, sf0001)
      .groupBy("source").agg(count(lit(1)).as("n_src"))
    val joined = kept.join(sizes, "source")
    assert(joined.filter(col("n_kept") =!= least(col("n_src"), lit(10))).count() === 0L)
    assert(kept.count() === sizes.count()) // no source dropped
    kept.unpersist()
  }

  test("f12 recursive CTE builds the full date spine with zero-order days") {
    val df = run("f12_recursive_cte").cache()
    // 1995-01-01 .. 1995-03-01 inclusive = 60 days
    assert(df.count() === 60L)
    val inRange = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-03-02")
      .count()
    assert(df.agg(sum("n_orders")).first().getLong(0) === inRange)
    // the left join must preserve days with no orders (sf0.001 is sparse:
    // 32 of the 60 spine days carry no order)
    assert(df.filter(col("n_orders") === 0).count() > 0)
    df.unpersist()
  }
}
