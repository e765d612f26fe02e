package graft

import graft.plans.{CosineTopKExec, GraftPlanner}
import org.apache.spark.sql.functions._

/** The CosineTopK whole-operator rewrite: fires on the declared pattern,
  * never changes results, and beats the naive plan.
  */
class PlanRewriteSpec extends SparkSpec {

  test("CosineTopKRewrite fires and plans CosineTopKExec") {
    val df = SparkEntry.queries("x1_cosine_topk")(spark, TestSpark.sf0001)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("CosineTopK"), s"rewrite did not fire:\n$physical")
  }

  test("rewritten plan returns identical rows to the naive declarative plan") {
    val fast = SparkEntry.queries("x1_cosine_topk")(spark, TestSpark.sf0001).collect()
    // disable the rewrite, keep the identical declarative query
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    try {
      val naive = SparkEntry.queries("x1_cosine_topk")(spark, TestSpark.sf0001)
      assert(!naive.queryExecution.executedPlan.toString.contains("CosineTopKExec"))
      assert(naive.collect().sameElements(fast))
    } finally spark.experimental.extraOptimizations = saved
  }

  test("NaN sims (zero-norm vectors) rank first, matching the declarative plan") {
    GraftPlanner.install(spark)
    graft.functions.VectorCosine.register(spark)
    import spark.implicits._
    // two zero vectors: their pair (and their pairs with others) is NaN
    val rows = (0L until 20L).map { i =>
      val v = if (i < 2) Array.fill(4)(0.0f)
              else Array.tabulate(4)(j => (i + j).toFloat)
      (i, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    def topk(e: org.apache.spark.sql.DataFrame) =
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(expr("graft_cosine(a.embedding, b.embedding)"), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
        .limit(5)
    val fastDf = topk(emb)
    assert(fastDf.queryExecution.executedPlan.toString.contains("CosineTopK"))
    val fast = fastDf.collect()
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    try {
      val naive = topk(emb).collect()
      assert(fast.sameElements(naive),
        s"NaN ordering diverged:\nfast=${fast.mkString(",")}\nnaive=${naive.mkString(",")}")
      assert(fast.head.getDouble(2).isNaN, "NaN pairs must rank first")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rewrite fires for any literal k and round scale (k=25, scale=4)") {
    GraftPlanner.install(spark)
    graft.functions.VectorCosine.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    def topk(k: Int, scale: Int) =
      emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(expr("graft_cosine(a.embedding, b.embedding)"), scale).as("sim"))
        .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
        .limit(k)
    val df = topk(25, 4)
    val exec = df.queryExecution.executedPlan.collectFirst {
      case e: CosineTopKExec => e
    }
    assert(exec.isDefined, "k=25/scale=4 variant did not plan CosineTopKExec:\n" +
      df.queryExecution.executedPlan)
    assert(exec.get.k === 25 && exec.get.scale === 4)
    // result parity at the widened parameters
    val fast = df.collect()
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    try {
      val naive = topk(25, 4).collect()
      assert(fast.sameElements(naive),
        s"k=25/scale=4 diverged:\nfast=${fast.mkString(",")}\nnaive=${naive.mkString(",")}")
    } finally spark.experimental.extraOptimizations = saved
    // out-of-range scale: no rewrite, still a safe declarative plan
    val wild = topk(5, 12)
    assert(!wild.queryExecution.executedPlan.toString.contains("CosineTopKExec"))
    assert(wild.count() === 5L)
  }

  test("ApproxDistinctRewrite: flag on plans HLL++ within 5%, flag off stays exact") {
    GraftPlanner.install(spark)
    val events = Tables.events(spark, TestSpark.sf0001)
    def q() = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val exact = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(graft.plans.ApproxDistinctRewrite.Flag, "true")
    try {
      val approxDf = q()
      val optimized = approxDf.queryExecution.optimizedPlan.toString
      assert(optimized.contains("approx_count_distinct") ||
        optimized.contains("hyperloglog"),
        s"flag did not rewrite the aggregate:\n$optimized")
      approxDf.collect().foreach { r =>
        val e = exact(r.getString(0)).toDouble
        assert(math.abs(r.getLong(1) - e) / e <= 0.05,
          s"${r.getString(0)}: approx ${r.getLong(1)} vs exact $e")
      }
    } finally spark.conf.set(graft.plans.ApproxDistinctRewrite.Flag, "false")
    // flag back off: exact again
    val again = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === exact)
  }

  test("ApproxDistinctRewrite leaves multi-column and filtered distincts exact") {
    GraftPlanner.install(spark)
    val events = Tables.events(spark, TestSpark.sf0001)
    spark.conf.set(graft.plans.ApproxDistinctRewrite.Flag, "true")
    try {
      val df = events.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id"), col("event_id")).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("approx_count_distinct") &&
        !optimized.contains("hyperloglog"),
        s"multi-column distinct must stay exact:\n$optimized")
      assert(df.count() > 0)
    } finally spark.conf.set(graft.plans.ApproxDistinctRewrite.Flag, "false")
  }

  test("rewrite leaves non-matching topk plans untouched") {
    GraftPlanner.install(spark)
    graft.functions.VectorCosine.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    // ascending sort — not the pattern; must plan as a normal join
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(expr("graft_cosine(a.embedding, b.embedding)"), 6).as("sim"))
      .orderBy(col("sim").asc, col("vec_a"), col("vec_b"))
      .limit(5)
    assert(!df.queryExecution.executedPlan.toString.contains("CosineTopKExec"))
    assert(df.count() === 5L)
  }
}
