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

  test("RangeJoinRewrite: BETWEEN join becomes a bucketed equi-join with identical rows") {
    import spark.implicits._
    GraftPlanner.install(spark)
    // defensive: make sure no earlier test left the flag set, so the
    // reference run below really is the naive plan (j10 itself restores
    // the flag since round 5)
    spark.conf.unset(graft.plans.RangeJoinRewrite.Flag)
    val points = (0L until 500L).map(i => (i, i * 37L % 10000L)).toDF("pid", "ts")
    val intervals = (0L until 60L).map(i => (i, i * 150L, i * 150L + 400L))
      .toDF("iid", "lo", "hi")
    def naiveJoin() = points.join(intervals,
      col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
    // flag off: nested-loop plan, reference results
    val expected = naiveJoin().collect()
    assert(naiveJoin().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    spark.conf.set(graft.plans.RangeJoinRewrite.Flag, "512")
    try {
      val rewritten = naiveJoin()
      val phys = rewritten.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"rule did not eliminate the nested loop:\n$phys")
      assert(phys.contains("__graft_pbucket"), "bucket column missing from plan")
      assert(rewritten.collect().sameElements(expected))
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.Flag)
  }

  test("RangeJoinRewrite leaves equi-joins and inverted intervals alone/safe") {
    import spark.implicits._
    GraftPlanner.install(spark)
    spark.conf.set(graft.plans.RangeJoinRewrite.Flag, "512")
    try {
      // equi-key present: rule must not touch the join
      val a = Seq((1L, 10L)).toDF("k", "v")
      val b = Seq((1L, 5L, 15L)).toDF("k2", "lo", "hi")
      val equi = a.join(b, col("k") === col("k2") &&
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_pbucket"))
      assert(equi.count() === 1L)
      // inverted interval (lo > hi): rewritten join matches nothing, no crash
      val inv = Seq((1L, 500L, 100L)).toDF("iid", "lo", "hi")
      val p = Seq((1L, 300L)).toDF("pid", "ts")
      val j = p.join(inv, col("ts") >= col("lo") && col("ts") <= col("hi"))
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_pbucket"))
      assert(j.count() === 0L)
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.Flag)
  }

  test("j10: the declared-naive range join key plans without a nested loop") {
    GraftPlanner.install(spark)
    spark.conf.set(graft.plans.RangeJoinRewrite.Flag, "300000000")
    try {
      val raw = graft.queries.RelationalOps.j10Raw(spark, TestSpark.sf0001)
      val phys = raw.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"j10 fell back to the nested loop:\n$phys")
      assert(phys.contains("__graft_pbucket"))
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.Flag)
    // the declared key materializes under the flag and RESTORES it — no
    // session-level side effect survives the call (round-4 advice #1)
    val df = SparkEntry.queries("j10_range_rule")(spark, TestSpark.sf0001)
    assert(df.count() > 0)
    assert(spark.conf.getOption(graft.plans.RangeJoinRewrite.Flag).isEmpty,
      "j10 leaked its bucket-width conf onto the session")
  }

  test("RangeJoinRewrite: floor-div bucket survives the negative long domain") {
    import spark.implicits._
    GraftPlanner.install(spark)
    // points within w of Long.MinValue: the old p - pmod(p, w) bucket
    // underflowed here and silently dropped matches (round-4 advice #3)
    val base = Long.MinValue
    val points = Seq((1L, base), (2L, base + 100L), (3L, base + 600L),
      (4L, -1L), (5L, 0L), (6L, 511L)).toDF("pid", "ts")
    val intervals = Seq((10L, base, base + 700L), (11L, -512L, 600L))
      .toDF("iid", "lo", "hi")
    def join() = points.join(intervals,
      col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid")
    val expected = join().collect()
    assert(expected.length === 6, "fixture should produce 6 matches naively")
    spark.conf.set(graft.plans.RangeJoinRewrite.Flag, "512")
    try {
      val rewritten = join()
      assert(rewritten.queryExecution.optimizedPlan.toString
        .contains("__graft_pbucket"), "rule did not fire on the fixture")
      assert(rewritten.collect().sameElements(expected),
        "bucketed join dropped or invented matches on the negative domain")
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.Flag)
  }

  test("RangeJoinRewrite: over-span interval raises a clear error, not an opaque one") {
    import spark.implicits._
    GraftPlanner.install(spark)
    // open-ended sentinel row: hi = Long.MaxValue explodes into ~2^54
    // buckets at w=512 — must fail with an actionable message naming the
    // conf, BEFORE any giant array materializes (round-4 advice #2)
    val points = Seq((1L, 300L)).toDF("pid", "ts")
    val sentinel = Seq((1L, 0L, Long.MaxValue)).toDF("iid", "lo", "hi")
    val j = points.join(sentinel,
      col("ts") >= col("lo") && col("ts") <= col("hi")).select("pid", "iid")
    assert(j.count() === 1L) // naive plan handles it (slowly)
    spark.conf.set(graft.plans.RangeJoinRewrite.Flag, "512")
    try {
      val e = intercept[Exception] { j.count() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("rangeJoin.maxSpan")),
        s"expected the actionable over-span message, got: $e")
      // a WIDE-but-bounded interval under the cap still works
      val wide = Seq((2L, 0L, 512L * 1000L)).toDF("iid", "lo", "hi")
      val ok = points.join(wide,
        col("ts") >= col("lo") && col("ts") <= col("hi")).select("pid", "iid")
      assert(ok.count() === 1L)
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.Flag)
  }

  test("NarrowGroupKeyRewrite: concat group key narrows to the raw integer " +
       "columns with identical results, including the negative domain") {
    GraftPlanner.install(spark)
    // negative fields exercise the injectivity proof's hard case:
    // a=1,b=-2 -> "1--2" and a=-1,b=2 -> "-1-2" must stay distinct groups
    val df = spark.range(0, 1000)
      .selectExpr("(id % 5) - 2 AS a", "(id % 7) - 3 AS b", "id AS v")
    def q = df.groupBy(concat(col("a").cast("string"), lit("-"),
        col("b").cast("string")).as("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .orderBy(col("k"))
    spark.conf.set(graft.plans.NarrowGroupKeyRewrite.Flag, "true")
    val narrowed = try {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("Aggregate [_graft_narrowkey_0"),
        s"rule did not narrow the grouping:\n$plan")
      val aggLine = plan.linesIterator
        .find(_.trim.startsWith("Aggregate")).getOrElse("")
      assert(!aggLine.contains("_groupingexpression"),
        s"concat-backed key survived as the group key:\n$plan")
      q.collect()
    } finally spark.conf.unset(graft.plans.NarrowGroupKeyRewrite.Flag)
    val declared = q.collect()
    assert(narrowed.sameElements(declared),
      "narrowing changed the aggregate's results")
    assert(declared.length === 35, "fixture should have 5*7 groups")
  }

  test("NarrowGroupKeyRewrite bails on every unsound shape") {
    GraftPlanner.install(spark)
    import spark.implicits._
    def grouped(df: org.apache.spark.sql.DataFrame,
        key: org.apache.spark.sql.Column) =
      df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
    def firesOn(df: org.apache.spark.sql.DataFrame,
        key: org.apache.spark.sql.Column): Boolean =
      grouped(df, key).queryExecution.optimizedPlan.toString
        .contains("_graft_narrowkey")
    spark.conf.set(graft.plans.NarrowGroupKeyRewrite.Flag, "true")
    try {
      val ints = spark.range(0, 100).selectExpr("id % 3 AS a", "id % 4 AS b")
      // the sound shape DOES fire (sanity for the bail assertions below)
      assert(firesOn(ints,
        concat(col("a").cast("string"), lit("-"), col("b").cast("string"))))
      // digit separator: "1" + "2"+"3" vs "12" + "3" would collide
      assert(!firesOn(ints,
        concat(col("a").cast("string"), lit("7"), col("b").cast("string"))))
      // no separator at all
      assert(!firesOn(ints,
        concat(col("a").cast("string"), col("b").cast("string"))))
      // multi-char separator (unproven in general — must bail)
      assert(!firesOn(ints,
        concat(col("a").cast("string"), lit("--"), col("b").cast("string"))))
      // non-integral field: string columns concat is not injective
      val strs = Seq(("x", "y"), ("x-y", "")).toDF("a", "b")
      assert(!firesOn(strs, concat(col("a"), lit("-"), col("b"))))
      // nullable field: Concat nulls the whole key, merging all
      // null-field rows into ONE group — the null-correct wrapper must
      // keep that exact shape: every (null, b) row shares one group.
      // Parquet round-trip: local-relation inputs get their Project
      // folded (ConvertToLocalRelation) and CASE-built nulls get the
      // cast pushed into the branches (the rule conservatively bails on
      // both); parquet attributes are the real nullable-column shape.
      val nullPath = s"${graft.Scratch.dir(spark)}/narrow_null_fixture"
      spark.range(0, 12).selectExpr(
          "CASE WHEN id % 3 = 0 THEN NULL ELSE id % 3 END AS a",
          "id % 2 AS b")
        .write.mode("overwrite").parquet(nullPath)
      val nullable = spark.read.parquet(nullPath)
      val key = concat(col("a").cast("string"), lit("-"),
        col("b").cast("string"))
      assert(firesOn(nullable, key))
      val nullRows = grouped(nullable, key).collect()
      assert(nullRows.count(_.isNullAt(0)) === 1, "null semantics drifted")
      assert(nullRows.find(_.isNullAt(0)).get.getAs[Long]("n") === 4,
        "null-key group lost a row")
      assert(nullRows.length === 5)
    } finally spark.conf.unset(graft.plans.NarrowGroupKeyRewrite.Flag)
  }

  test("q2h: the declared-naive concat group key plans narrowed, " +
       "matching the unrewritten results") {
    GraftPlanner.install(spark)
    val d = TestSpark.sf0001
    def raw = graft.queries.ReferenceQueries.q2hRaw(spark, d)
    // flag off: the concat-backed grouping ships as declared
    assert(!raw.queryExecution.optimizedPlan.toString
      .contains("_graft_narrowkey"))
    val declared = raw.orderBy(col("line_key")).collect()
    spark.conf.set(graft.plans.NarrowGroupKeyRewrite.Flag, "true")
    val narrowed = try {
      val qe = raw.queryExecution
      assert(qe.optimizedPlan.toString.contains("_graft_narrowkey"),
        s"rule did not fire on q2h:\n${qe.optimizedPlan}")
      val phys = qe.executedPlan.toString
      assert(phys.contains("HashAggregate(keys=[_graft_narrowkey") ||
             phys.contains("HashAggregate(keys=[knownfloatingpointnormalized") ||
             phys.split("\n").exists(l => l.contains("HashAggregate") &&
               l.contains("_graft_narrowkey")),
        s"physical agg not keyed on the narrowed columns:\n$phys")
      raw.orderBy(col("line_key")).collect()
    } finally spark.conf.unset(graft.plans.NarrowGroupKeyRewrite.Flag)
    assert(narrowed.sameElements(declared),
      "q2h narrowing changed the results")
  }
}
