package graft

import org.apache.spark.sql.functions._

/** Round-17 (optimization round 1) pins: the count-shaped CosineTopK
  * rewrite (the bench's timed `.count()` action must run the fused
  * operator, not the BNLJ fallback it silently fell back to), the x39b
  * decision-artifact steady state, widenIfStarved's identity/widen
  * contract, and the x81d pinned build side.
  */
class Round17Spec extends SparkSpec {

  test("CosineTopKRewrite fires under the count-shaped pruned-Project plan") {
    // the declared shape (materialization path) — sanity: still fires
    val df = SparkEntry.queries("x1_cosine_topk")(spark, TestSpark.sf0001)
    assert(df.queryExecution.executedPlan.toString.contains("CosineTopK"),
      "fused operator missing from the declared plan")
    // the bench's timed action: an aggregate-only consumer makes
    // ColumnPruning interpose an empty Project between limit and sort —
    // the r16 pattern missed it and the bench timed the BNLJ fallback
    val counted = df.groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("CosineTopK"),
      "fused operator missing under count() — the bench would time the fallback")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "BNLJ fallback planned under count()")
    // and the fused path agrees with the declarative result
    assert(counted.head().getLong(0) === df.count())
  }

  test("x39b steady state reads the published decision artifact") {
    // first build publishes decisions (one action per corpus snapshot)
    SparkEntry.queries("x39b_refresh_merge")(spark, TestSpark.sf0001).count()
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // r17 ADVICE #4 (flake guard): count only jobs attributable to THIS
    // thread's construction via a unique job group (thread-local), so a
    // lingering async job from the preceding count(), a ScopedCache
    // release, or another suite's straggler can never trip the assertion.
    val group = s"x39b-steady-${System.nanoTime()}"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null &&
            group == j.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "x39b steady-state construction")
      val df = try
        SparkEntry.queries("x39b_refresh_merge")(spark, TestSpark.sf0001)
      finally spark.sparkContext.clearJobGroup()
      Thread.sleep(1000) // listener bus is async; give group events time
      assert(jobs.get() === 0,
        s"steady-state x39b construction ran ${jobs.get()} job(s) — " +
          "the published decision set must be reused, not re-decided")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("graft_x39b_decisions_"),
        "plan does not read the published decision layout")
      // the decide chain must be OUT of the steady-state plan: no batch
      // re-fingerprinting (shinglehashes) anywhere in it
      assert(!plan.toLowerCase.contains("shinglehashes"),
        "steady-state x39b still re-runs the simhash decide chain")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("x39b decision layout name embeds the decide-chain constants") {
    // geometry discipline (WinnowGeomTag rule): changing the gram width,
    // split, twins or hamming threshold must RENAME the layout
    val scratch = new java.io.File(graft.Scratch.dir(spark))
    val dirs = Option(scratch.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("graft_x39b_decisions_")).map(_.getName)
    assert(dirs.nonEmpty, "decision layout not published")
    val k = graft.functions.ShingleHashes.DefaultK
    dirs.foreach { n =>
      assert(n.contains(s"k$k") && n.contains("s5") && n.contains("t7") &&
        n.contains("h3"), s"layout name $n missing a decide-chain constant")
    }
  }

  test("widenIfStarved widens a starved frame and leaves a wide one alone") {
    val starved = spark.range(0, 1000, 1, 1).toDF("doc_id")
    val widened = graft.queries.PipelineOps.widenIfStarved(starved, col("doc_id"))
    assert(widened.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism,
      "starved frame not widened to the session parallelism")
    // identity case: already at >= cores/4 partitions — no exchange added
    val wide = spark.range(0, 1000, 1,
      spark.sparkContext.defaultParallelism).toDF("doc_id")
    val same = graft.queries.PipelineOps.widenIfStarved(wide, col("doc_id"))
    assert(same.queryExecution.logical eq wide.queryExecution.logical,
      "widenIfStarved must be the identity on a non-starved frame")
    // content unchanged either way
    assert(widened.agg(sum(col("doc_id"))).head().getLong(0) ===
      starved.agg(sum(col("doc_id"))).head().getLong(0))
  }

  test("x81d build side is pinned to the grid subtree") {
    val df = SparkEntry.queries("x81d_selector_curve")(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the theta join must build (broadcast) the LEFT = 10-row grid side;
    // an estimate flip to the corpus-sized scored frame would read
    // BuildRight here
    val bnljLines = plan.split("\n").filter(_.contains("BroadcastNestedLoopJoin"))
    assert(bnljLines.exists(l => l.contains("BuildLeft") && l.contains("LeftOuter")),
      s"pinned grid-side BNLJ not found:\n${bnljLines.mkString("\n")}")
  }

  test("bench record gate-status: baseline_keys reflects the parsed baseline") {
    // the committed baseline parses non-empty (a 0 in a record means the
    // gate was disabled — BENCH_ARTIFACTS.md reading convention)
    val committed = BenchGate.parseBaseline(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("docs/bench_baseline.json")), "UTF-8"))
    assert(committed.nonEmpty)
  }
}
