package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Round-11 verdict items: CBO join reorder actually fires (stats-driven
  * plan change, not just a green oracle), and the fused codegen'd shingle
  * kernel is fingerprint-identical to the interpreted HOF pipeline it
  * replaced.
  */
class Round11Spec extends SparkSpec {

  test("c1: CBO + ANALYZE'd stats reorder the join; parent confs untouched") {
    val cboBefore = spark.conf.get("spark.sql.cbo.enabled")
    val bcBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val df = graft.queries.RelationalOps.c1CboReorder(spark, TestSpark.sf0001)
    df.collect()

    // the syntactic order is (orders ⋈ customer) ⋈ σ(nation); with stats the
    // DP reorderer must join the selective dim first: the INNERMOST join
    // (the one with no Join descendant) must be over {customer, nation}
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, "c1 plan lost its joins entirely")
    val innermost = joins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    assert(innermost.nonEmpty, "no innermost join found in the c1 plan")
    val leafTables = innermost.head.collectLeaves().flatMap {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table)
      case _ => None
    }.map(_.replaceAll("^c1_", "").replaceAll("_[A-Za-z0-9_]*$", ""))
    assert(leafTables.toSet == Set("customer", "nation"),
      s"CBO did not reorder the selective dim join first; innermost join is " +
        s"over $leafTables in plan:\n${df.queryExecution.optimizedPlan}")

    // conf-island: CBO knobs must not leak into the parent session
    assert(spark.conf.get("spark.sql.cbo.enabled") == cboBefore,
      "c1 leaked spark.sql.cbo.enabled into the parent session")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == bcBefore,
      "c1 leaked autoBroadcastJoinThreshold into the parent session")

    // and the stats-driven plan must compute the same result as the stock
    // plan over the same parquet (reorder is a pure optimization)
    val stock = {
      val o = Tables.orders(spark, TestSpark.sf0001)
      val c = Tables.customer(spark, TestSpark.sf0001)
      val n = Tables.nation(spark, TestSpark.sf0001).filter(col("n_regionkey") === 0)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.money(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("n_name"))
    }
    assert(df.collect().toSeq == stock.collect().toSeq,
      "CBO-reordered result differs from the stock plan's result")

    // causality: WITHOUT stats the same syntactic order keeps orders in
    // the innermost join — so the {customer, nation} inner pair above is
    // the statistics' doing, not a coincidence of Catalyst defaults
    val stockJoins = stock.queryExecution.optimizedPlan.collect { case j: Join => j }
    val stockInner = stockJoins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    val stockLeaves = stockInner.head.collectLeaves().flatMap {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.schema.fieldNames.headOption
      case _ => None
    }
    assert(stockLeaves.exists(_.startsWith("o_")),
      s"stock (no-stats) plan unexpectedly reordered too — leaves $stockLeaves; " +
        "the c1 assertion would no longer prove CBO causality")
  }

  test("shingle kernel: codegen'd ShingleHashes == interpreted HOF pipeline") {
    graft.functions.StringPolyHash.register(spark)
    graft.functions.ShingleHashes.register(spark)
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    // the exact expressions the dedup family used before r11
    val hofSet =
      "sort_array(array_distinct(transform(" +
        "transform(sequence(1, size(toks)-2), " +
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i+1), ' ', element_at(toks, i+2))), " +
        "s -> graft_polyhash(s))))"
    val hofAll =
      "transform(sequence(1, size(toks)-2), " +
        "i -> graft_polyhash(concat(element_at(toks, i), ' ', " +
        "element_at(toks, i+1), ' ', element_at(toks, i+2))))"
    val mismatches = docs.select(col("doc_id"),
        expr(hofSet).as("old_set"),
        expr("graft_shingle_hashes(toks)").as("new_set"),
        expr(hofAll).as("old_all"),
        expr("graft_shingle_hashes_all(toks)").as("new_all"))
      .filter(col("old_set") =!= col("new_set") || col("old_all") =!= col("new_all"))
      .count()
    assert(mismatches == 0L,
      "codegen'd shingle hashes diverge from the interpreted HOF definition")
    // edge cases the corpus may not cover: empty tokens, duplicate shingles,
    // exactly-3 tokens, multi-byte-free ASCII boundary behavior
    val sess = spark
    import sess.implicits._
    val edge = Seq(
      "a b c",
      "a b c a b c a b c",
      "x  y  z",
      "one two three four five",
      // multi-byte UTF-8 (negative JVM bytes through the & 0xff path) —
      // the classic fused-kernel divergence corner (r11 ADVICE)
      "café naïve über résumé",
      "日本 語の 文書 です ね").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val bad = edge.select(
        expr(hofSet).as("o1"), expr("graft_shingle_hashes(toks)").as("n1"),
        expr(hofAll).as("o2"), expr("graft_shingle_hashes_all(toks)").as("n2"))
      .filter(col("o1") =!= col("n1") || col("o2") =!= col("n2"))
      .count()
    assert(bad == 0L, "shingle kernel diverges on edge-case token arrays")
  }

  test("x70 merge rewrite has zero-width-boundary reference BPE semantics") {
    // the in-row fold must behave like Sennrich's lookaround-guarded
    // re.sub: adjacent occurrences both merge, symbol-level self-overlaps
    // stay left-biased (INCLUDING odd runs ≥ 5, where the retired two-pass
    // replace diverged — r11 ADVICE), and right boundaries never match a
    // longer symbol's prefix. Every `expected` below is literal re.sub
    // output.
    val sess = spark
    import sess.implicits._
    val cases = Seq(
      ("a b a b", "ab ab"),     // adjacent: one-pass replace would give "ab a b"
      ("a b a b a", "ab ab a"),
      ("b a b a b", "b ab ab"),
      ("x a b y", "x ab y"),
      ("a bc", "a bc"),         // 'b' must not match the prefix of symbol 'bc'
      ("ab a b", "ab ab"),
      ("ab", "ab"))             // single-symbol word: fold over empty tail
    val df = cases.toDF("sym", "expected")
      .withColumn("pair", lit("a b"))
      .withColumn("got", expr(graft.queries.PipelineOps.BpeMergeExpr))
    val bad = df.filter(col("got") =!= col("expected"))
      .select(col("sym"), col("got"), col("expected")).collect()
    assert(bad.isEmpty, s"merge rewrite diverges from reference BPE: ${bad.mkString(", ")}")
    // self-overlapping pair "a a": the reference scan merges greedily left
    // to right and never reconsiders a just-merged token, so a run of k
    // a's becomes floor(k/2) leftmost 'aa's (+ trailing 'a' if odd). The
    // odd-run-≥5 rows are exactly where the two-pass replace used to give
    // "aa a aa" instead of re.sub's "aa aa a".
    val df2 = Seq(
      ("a a a a", "aa aa"),
      ("a a a", "aa a"),
      ("a a a a a", "aa aa a"),
      ("a a a a a a a", "aa aa aa a"))
      .toDF("sym", "expected")
      .withColumn("pair", lit("a a"))
      .withColumn("got", expr(graft.queries.PipelineOps.BpeMergeExpr))
    val bad2 = df2.filter(col("got") =!= col("expected"))
      .select(col("sym"), col("got"), col("expected")).collect()
    assert(bad2.isEmpty, s"self-overlap merge diverged: ${bad2.mkString(", ")}")
    // a merged-token pair ("a aa"): merging must compare whole tokens, and
    // the merged "aaa" must not re-match as 'a' for the following 'aa'
    val df3 = Seq(("a aa a aa", "aaa aaa")).toDF("sym", "expected")
      .withColumn("pair", lit("a aa"))
      .withColumn("got", expr(graft.queries.PipelineOps.BpeMergeExpr))
    assert(df3.filter(col("got") =!= col("expected")).count() == 0,
      "merged-token pair rewrite diverged")
  }

  test("AvailableNow file-source stream over real events parquet matches batch") {
    // the deployment-shaped path (readStream over the actual parquet →
    // foreachBatch → scratch sink), not just the MemoryStream-shaped one:
    // an AvailableNow run must drain the whole table and land exactly the
    // batch aggregation's rows.
    import org.apache.spark.sql.streaming.Trigger
    val d = TestSpark.sf0001
    val path = s"$d/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val phys = spark.read.parquet(path).schema
    // the file source takes a DIRECTORY (the landing-dir deployment shape);
    // testdata ships single-file tables, so point at the SF dir and filter
    // to this table's file
    val raw = spark.readStream.schema(phys)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    // same ts canonicalization Tables.events applies (dtype-branched)
    val canon = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val agg = graft.streaming.Streams.tumblingCounts(canon)
    val outDir = s"${graft.Scratch.dir(spark)}/graft_stream_filesource_out"
    val ckpt = s"${graft.Scratch.dir(spark)}/graft_stream_filesource_ckpt"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(new java.io.File(outDir)); rmrf(new java.io.File(ckpt))
    val q = agg.writeStream
      .outputMode("complete") // complete: every window survives → batch parity
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    assert(q.awaitTermination(180000),
      "AvailableNow run did not drain the file source in time")
    val streamed = spark.read.parquet(outDir)
      .collect().map(_.toString).sorted.toSeq
    val batchRes = graft.streaming.Streams
      .tumblingCounts(Tables.events(spark, d))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty, "stream landed zero rows")
    assert(streamed == batchRes,
      s"file-source streaming result diverges from batch (${streamed.size} vs ${batchRes.size} rows)")
  }

  test("shingle kernel stays inside WholeStageCodegen") {
    graft.functions.ShingleHashes.register(spark)
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(expr("graft_shingle_hashes(toks)").as("hs"))
    // `*(n)` is the WholeStageCodegen span marker in the plan string; the
    // Project carrying shinglehashes must be inside one
    val plan = docs.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("shinglehashes"))
    assert(projLine.exists(_.trim.matches("""^\+?-?\s*\*\(\d+\).*""")),
      s"shingle projection fell out of WholeStageCodegen:\n$plan")
  }
}
