package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Round-2 keys: external-process TRANSFORM, scale-join wrappers, LSH/IVF
  * parameter variants, non-parquet source scan. Each test pins the key to an
  * in-engine equivalent; cross-engine equivalence is the Verify/oracle gate.
  */
class Round2Spec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("q4_pipe external-process tokenizer matches in-JVM q4_wordcount") {
    val piped = run("q4_pipe").collect()
    val jvm = run("q4_wordcount").collect()
    assert(piped.sameElements(jvm))
  }

  test("j6 bucketized range join equals the naive BETWEEN join") {
    val ev = Tables.events(spark, sf0001).withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        (col("ts_us") - 600000000L).as("lo"), col("ts_us").as("hi"))
    val naive = clicks.join(purchases,
        col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
      .orderBy(col("purchase_id")).collect()
    assert(run("j6_range_bucket").collect().sameElements(naive))
    assert(naive.nonEmpty)
  }

  test("j7 salted join equals the plain join aggregate") {
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           sum(Tables.money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment")).collect()
    assert(run("j7_salted_join").collect().sameElements(plain))
  }

  test("x8b 6-plane LSH keeps the subset property vs exact x1 top pair") {
    val exactTop = run("x1_cosine_topk", sf001).head().getDouble(2)
    val lshTop = run("x8b_ann_lsh6", sf001).head().getDouble(2)
    assert(lshTop <= exactTop)
    // the 8-plane bucketing refines the 6-plane one (same planes 0-5 plus
    // two more bits), so the 6-plane candidate set is a superset and its
    // top sim is at least the 8-plane top sim
    val lsh8Top = run("x8_ann_lsh", sf001).head().getDouble(2)
    assert(lshTop >= lsh8Top)
  }

  test("x8c multi-table LSH recall >= single-table: top sim at least x8's") {
    val multiTop = run("x8c_ann_lsh_multi", sf001).head().getDouble(2)
    val singleTop = run("x8_ann_lsh", sf001).head().getDouble(2)
    assert(multiTop >= singleTop)
    val exactTop = run("x1_cosine_topk", sf001).head().getDouble(2)
    assert(multiTop <= exactTop)
  }

  test("x12b 8-pivot IVF returns full top-3 lists for every query vector") {
    val rows = run("x12b_ann_ivf8", sf001).collect()
    assert(rows.length === 30) // 10 query vectors x top-3
  }

  test("x15 clusters are consistent: every near-dup pair shares a cluster") {
    val labels = run("x15_dedup_clusters", sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = run("x3_minhash_neardup", sf001)
      .select(col("doc_a"), col("doc_b")).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters")
    }
    // canonical id is the cluster minimum and is its own label
    labels.values.toSet.foreach { (c: Long) => assert(labels(c) == c) }
  }

  test("src1 CSV roundtrip aggregate equals the parquet-side aggregate") {
    val parquetSide = Tables.customer(spark, sf0001)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           sum(Tables.money(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      .orderBy(col("c_mktsegment")).collect()
    assert(run("src1_csv_scan").collect().sameElements(parquetSide))
  }
}
