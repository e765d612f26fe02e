package graft

import graft.functions.TopKTokensAgg
import org.apache.spark.sql.functions._

/** Sketch-path specs: the space-saving eviction branch (never exercised by
  * u4, whose capacity exceeds the vocabulary) and IVF recall vs brute force.
  */
class SketchSpec extends SparkSpec {

  test("space-saving eviction preserves heavy hitters with over-estimate bound") {
    import spark.implicits._
    // 100 x "hot1", 80 x "hot2", 60 singletons -> capacity 4 forces eviction
    val tokens = Seq.fill(100)("hot1") ++ Seq.fill(80)("hot2") ++
      (1 to 60).map(i => s"cold$i")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_small", exprs => TopKTokensAgg(exprs.head, k = 2, capacity = 4)
        .toAggregateExpression(), "built-in")
    val top = tokens.toDF("token").repartition(4)
      .agg(expr("topk_small(token)").as("top"))
      .select(explode(col("top")).as("tc"))
      .select(col("tc.token"), col("tc.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // space-saving guarantee: true heavy hitters survive; counts >= true count
    assert(top.contains("hot1") && top("hot1") >= 100)
    assert(top.contains("hot2") && top("hot2") >= 80)
    // over-estimate is bounded by total/capacity per merge path — sanity cap
    assert(top("hot1") <= 240 && top("hot2") <= 240)
  }

  test("IVF ANN recall: top-1 neighbor from x12 is a true near neighbor") {
    val ivf = SparkEntry.queries("x12_ann_ivf")(spark, TestSpark.sf0001)
      .filter(col("rk") === 1)
    val brute = SparkEntry.queries("x1b_knn")(spark, TestSpark.sf0001)
      .filter(col("rk") === 1)
      .select(col("q_id"), col("sim").as("best_sim"))
    // IVF probes one cell, so its best hit can trail brute force, but must
    // never beat it, and should recover a decent fraction of the true sim
    val joined = ivf.join(brute, "q_id")
      .select(col("q_id"), col("sim"), col("best_sim")).collect()
    assert(joined.length === 10)
    joined.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-12)
    }
    val recallAt1 = joined.count(r => r.getDouble(1) >= r.getDouble(2) - 1e-12)
    info(s"IVF recall@1 (exact sim match): $recallAt1/10")
  }
}
