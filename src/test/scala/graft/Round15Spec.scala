package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the BenchGate memory-degradation rule (r14 verdict #1 —
  * the r14 driver record printed `comparable:true` at host_mem_factor 1.46
  * with a ~30% inflated headline; the DRAM leg existed but nothing acted
  * on it), the locale-pinned JSON numeric formatting (r14 ADVICE), the
  * x79 oversize-document gate (r14 verdict #2), the strict-lever guard
  * (r14 verdict #3), and the x78 allocated-vs-realized undershoot columns
  * (r14 verdict #4).
  */
class Round15Spec extends SparkSpec {

  // ===== BenchGate memory-degradation rule (r14 verdict #1) ===============

  test("memDegraded: quiet band passes, every observed contended reading gates") {
    // quiet builder band observed across r13/r14 records: 0.88–0.97
    assert(!BenchGate.memDegraded(0.88))
    assert(!BenchGate.memDegraded(0.97))
    // the gate itself is exclusive at the threshold
    assert(!BenchGate.memDegraded(BenchGate.MemDegradedGate))
    // the r14 driver's caught contended run (1.46) and the hammer-contended
    // memcal probe (2.76) must both gate
    assert(BenchGate.memDegraded(1.46))
    assert(BenchGate.memDegraded(2.76))
  }

  test("memDegraded threshold sits between the calibration bands") {
    // docs/memcal_probe.json: solo mem leg 0.193s/0.20 nominal ≈ 0.97,
    // contended 2.76. The threshold must clear the quiet band with margin
    // and catch the mildest observed degradation (1.46) with margin.
    assert(BenchGate.MemDegradedGate > 1.0 && BenchGate.MemDegradedGate < 1.46)
  }

  test("cpuDegraded: quiet band and mem-hammer cross-talk pass, spin hammer gates") {
    // quiet band 0.91–1.01 across r12–r15 records; the MEMORY hammer only
    // moves the cache-resident CPU leg to 1.16 (memcal) — that run must
    // gate as memory, not cpu; the cpu spin hammer reads >2
    // (docs/cpugate_probe.json)
    assert(!BenchGate.cpuDegraded(1.01))
    assert(!BenchGate.cpuDegraded(1.16))
    assert(BenchGate.cpuDegraded(2.0))
    assert(BenchGate.CpuDegradedGate > 1.16 && BenchGate.CpuDegradedGate < 2.0)
  }

  test("degraded label names the gating leg(s)") {
    assert(BenchGate.degradedLabel(0.95, 0.95).isEmpty)
    assert(BenchGate.degradedLabel(0.95, 1.46).contains("memory"))
    assert(BenchGate.degradedLabel(2.1, 0.95).contains("cpu"))
    assert(BenchGate.degradedLabel(2.1, 3.0).contains("cpu+memory"))
    // the memcal sandwich reading (cpu 1.16, mem 2.76) is MEMORY-only
    assert(BenchGate.degradedLabel(1.16, 2.76).contains("memory"))
  }

  // ===== Locale-pinned JSON emitters (r14 ADVICE) ==========================

  test("bench JSON numerics are locale-independent") {
    val saved = java.util.Locale.getDefault
    try {
      // de_DE formats %.3f with a comma decimal separator — the exact
      // corruption mode the advice names for a machine-read artifact
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(BenchGate.num(1.5, 3) == "1.500")
      assert(BenchGate.num(0.125, 2) == "0.13" || BenchGate.num(0.125, 2) == "0.12")
      assert(!BenchGate.num(1234.5678, 3).contains(","))
      val stat = BenchGate.statJson("k", 1.5, 2.25, cachedArtifact = false)
      assert(stat.contains("\"min\":1.500") && stat.contains("\"spread\":2.25"),
        s"statJson must format under Locale.ROOT regardless of default: $stat")
    } finally java.util.Locale.setDefault(saved)
  }

  test("statJson format is pinned (cached_artifact both ways)") {
    assert(BenchGate.statJson("k", 1.0, 2.0, cachedArtifact = true)
      == """"k":{"min":1.000,"spread":2.00,"cached_artifact":true}""")
    assert(BenchGate.statJson("k", 1.0, 2.0, cachedArtifact = false)
      == """"k":{"min":1.000,"spread":2.00,"cached_artifact":false}""")
  }

  // ===== x79 oversize-document gate (r14 verdict #2) =======================

  /** 2^21 + 2 tokens → exactly 2^21 grams — the smallest out-of-domain
    * document (the kernel requires m < 2^21).
    */
  private def monsterText: String = {
    val n = (1 << 21) + 2
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) { if (i > 0) sb.append(' '); sb.append('a'); i += 1 }
    sb.toString
  }

  test("x79 oversize gate: a >=2^21-gram document is flagged, not fatal") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, monsterText)).toDF("doc_id", "text")
    // the fingerprint stage completes (no executor-side require) and the
    // monster doc selects nothing — it can never become an x79b candidate
    val fpDocs = graft.queries.PipelineOps.winnowFingerprints(spark, corpus)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(fpDocs == Set(1L),
      s"oversize doc must be gated out of the fingerprint table: $fpDocs")
    // the profile REPORTS the skip: n_fp 0, density_ppm -1 — the flagged
    // count a pipeline owner reads (in-domain doc keeps a real profile)
    val prof = graft.queries.PipelineOps.winnowProfileOver(spark, corpus)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof(1L)._2 >= 1 && prof(1L)._3 > 0)
    assert(prof(2L) == ((1L << 21, 0L, -1L)),
      s"monster doc must carry the flagged (n_fp 0, density -1) row: ${prof(2L)}")
    // streaming twin: identical policy, bit-identical rows over the same
    // corpus (the stateless-twin rule extends to the out-of-domain path)
    val streamed = graft.streaming.Streams.winnowProfileStream(corpus)
      .collect().map(_.toString).sorted
    val batch = graft.queries.PipelineOps.winnowProfileOver(spark, corpus)
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  // ===== strict lever guard (r14 verdict #3) ===============================

  test("strict lever guard: non-default levers fail fast under Verify's flag") {
    val d = TestSpark.sf0001
    def clear(): Unit = {
      spark.conf.unset("spark.graft.oracleStrict")
      spark.conf.unset("spark.graft.x72.blockPrefixLen")
      spark.conf.unset("spark.graft.x79.dfCap")
    }
    clear()
    try {
      // default geometry under strict: every lever-bearing key builds —
      // Verify's posture, and the reason the flag is safe to always set
      spark.conf.set("spark.graft.oracleStrict", "true")
      SparkEntry.queries("x72_sorted_neighborhood")(spark, d)
      SparkEntry.queries("x79b_winnow_pairs")(spark, d)
      // non-default lever + strict: fail FAST with an error naming the
      // conf (not a silent oracle hash-mismatch 250 keys later)
      spark.conf.set("spark.graft.x72.blockPrefixLen", "3")
      val e1 = intercept[IllegalStateException] {
        SparkEntry.queries("x72_sorted_neighborhood")(spark, d)
      }
      assert(e1.getMessage.contains("spark.graft.x72.blockPrefixLen=3") &&
        e1.getMessage.contains("oracle"))
      spark.conf.set("spark.graft.x79.dfCap", "7")
      val e2 = intercept[IllegalStateException] {
        SparkEntry.queries("x79b_winnow_pairs")(spark, d)
      }
      assert(e2.getMessage.contains("spark.graft.x79.dfCap=7"))
      // non-default lever WITHOUT strict: honored unchanged — the levers
      // remain real production skew knobs (bench/probe territory)
      spark.conf.unset("spark.graft.oracleStrict")
      SparkEntry.queries("x72_sorted_neighborhood")(spark, d)
      SparkEntry.queries("x79b_winnow_pairs")(spark, d)
    } finally clear()
  }

  // ===== x78 undershoot as data + x78b redistribution (r14 verdict #4) ====

  /** Clamped fixture: stratum "aa" has 2 docs but earns ~14 Hamilton seats
    * (K=400, weights ∝ sqrt n over n = {2, 400, 400}), so its allocation
    * clamps and the budget undershoots — the regime the real testdata
    * never produces (its strata all dwarf their seat counts).
    */
  private def clampedCorpus = {
    val spark0 = spark
    import spark0.implicits._
    (((1L to 2L).map(i => ("aa", i)) ++
      (101L to 500L).map(i => ("bb", i)) ++
      (1001L to 1400L).map(i => ("cc", i)))).toDF("lang", "doc_id")
  }

  test("x78: the clamp undershoot is visible as k_seats > k_alloc") {
    val out = graft.queries.CorpusOps.x78Over(spark, clampedCorpus)
    val perLang = out.groupBy("lang")
      .agg(max("k_seats").as("seats"), max("k_alloc").as("alloc"),
        count(lit(1)).as("realized"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the clamped stratum: seats exceed size 2, realized = k_alloc = 2
    val (aaSeats, aaAlloc, aaRealized) = perLang("aa")
    assert(aaSeats > aaAlloc, s"aa must show the clamp: $perLang")
    assert(aaAlloc == 2L && aaRealized == 2L)
    // unclamped strata: seats == alloc == realized rows
    Seq("bb", "cc").foreach { l =>
      val (s0, a0, r0) = perLang(l)
      assert(s0 == a0 && a0 == r0, s"$l must be unclamped: $perLang")
    }
    // the corpus-level undershoot is the stranded seats — Σ realized < K
    val total = out.count()
    assert(total == graft.queries.CorpusOps.TempBudget - (aaSeats - aaAlloc),
      s"total $total vs budget ${graft.queries.CorpusOps.TempBudget}")
  }

  test("x78b: one redistribution round realizes the stranded budget") {
    val x78 = graft.queries.CorpusOps.x78Over(spark, clampedCorpus)
    val x78b = graft.queries.CorpusOps.x78bOver(spark, clampedCorpus)
    // full budget realized (round-2 capacity is ample in this fixture)
    assert(x78b.count() == graft.queries.CorpusOps.TempBudget)
    val perLang = x78b.groupBy("lang")
      .agg(max("k_extra").as("extra"), max("k_alloc").as("alloc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // the clamped stratum gets nothing back (no capacity); the stranded
    // seats land on the strata that can absorb them
    assert(perLang("aa")._1 == 0L && perLang("aa")._2 == 2L)
    assert(perLang("bb")._1 > 0L && perLang("cc")._1 > 0L)
    // selection is prefix-stable: x78b's per-stratum selection extends
    // x78's (same hash order, larger k) — the doc sets nest
    val base = x78.select("doc_id").collect().map(_.getLong(0)).toSet
    val redis = x78b.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(redis))
  }

  // ===== x78c/x78d token-budget sampling ===================================

  test("x78c: token quotas are Hamilton-exact, selection is a coherent prefix") {
    val out = SparkEntry.queries("x78c_token_budget_sample")(
      spark, TestSpark.sf0001).collect()
    val byLang = out.groupBy(r => Option(r.getString(0)))
    // Σ quota = B exactly (Hamilton; every sf0.001 stratum's quota is in
    // the hundreds-to-thousands vs 10-token minimum docs, so every
    // stratum contributes rows and the per-stratum quota is observable)
    val quotas = byLang.map { case (_, rs) => rs.map(_.getAs[Long]("quota")).head }
    assert(quotas.sum == graft.queries.CorpusOps.TokBudget,
      s"quota sum ${quotas.sum} != budget")
    byLang.foreach { case (l, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      val quota = sorted.head.getAs[Long]("quota")
      // rn is consecutive from 1, cum_tok is the exact running n_tok sum,
      // and every selected row fits the quota (strict prefix rule)
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length).toSeq)
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("cum_tok") == cum, s"$l cum mismatch at rn ${r.getAs[Long]("rn")}")
      }
      assert(cum <= quota, s"$l overshot: $cum > $quota")
    }
  }

  test("x78d: bit-identical to x78c, mass threshold below the running-sum window") {
    val d = TestSpark.sf0001
    val x78c = SparkEntry.queries("x78c_token_budget_sample")(spark, d)
    val x78d = SparkEntry.queries("x78d_token_budget_prefilter")(spark, d)
    assert(x78d.collect().map(_.toString).toSeq ==
      x78c.collect().map(_.toString).toSeq, "x78d selection diverged from x78c")
    // the load-bearing plan property: h < t bounds the running-sum
    // window's input at ~8·quota tokens per stratum
    assert(PlanChecks.hasThresholdBelowWindow(x78d),
      s"no mass threshold below the window:\n${x78d.queryExecution.optimizedPlan}")
    // both branches present: prefiltered selection + shortfall fallback
    assert(PlanChecks.windowCount(x78d) >= 2)
    // and the baseline must NOT carry the prefilter
    assert(!PlanChecks.hasThresholdBelowWindow(x78c))
  }

  test("x78d: giant-document shortfall falls back to the exact x78c ranking") {
    import spark.implicits._
    graft.functions.StringPolyHash.register(spark)
    val mod = graft.functions.StringPolyHash.DefaultMod
    // candidate pool with precomputed scramble hashes: the GIANT document
    // (200k tokens — virtually all the stratum's mass) gets the max-hash
    // id, so it lands ABOVE the mass threshold and the survivors carry
    // only a few hundred tokens « quota — the exact regime the fallback
    // exists for (reachable, unlike x76's uniform-count 10^-60 tail).
    // 200k, not less: polyhash of short numeric strings tops out around
    // 507k of the 10^6 modulus, so the threshold 8·quota·mod/tok must be
    // pushed BELOW that observed max for the giant to be excludable
    val hs = (1L to 1000L).toDF("doc_id")
      .selectExpr("doc_id", "graft_polyhash(cast(doc_id as string)) as h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val giant = hs.maxBy(_._2)._1
    val small = (1L to 1000L).filter(_ != giant).take(399)
    val giantText = Array.fill(200000)("t").mkString(" ")
    val dirPath = java.nio.file.Files.createTempDirectory("graft_x78d")
    val dir = dirPath.toString
    try {
      val rows = small.map(i => (i, "x", "gg", "src", 1L)) :+
        ((giant, giantText, "gg", "src", giantText.length.toLong))
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // precondition: the giant is really excluded by the threshold and
      // the survivors really fall short of the quota (else this test
      // would pass without exercising the fallback)
      val tok = 200000L + 399L
      val quota = graft.queries.CorpusOps.TokBudget // single stratum
      val t = math.min(mod, 8L * quota * mod / tok)
      assert(hs(giant) >= t, s"fixture broken: giant h ${hs(giant)} < t $t")
      val survMass = small.count(i => hs(i) < t).toLong
      assert(survMass < quota, s"fixture broken: survivors $survMass >= quota")
      val c = SparkEntry.queries("x78c_token_budget_sample")(spark, dir).collect()
      val p = SparkEntry.queries("x78d_token_budget_prefilter")(spark, dir).collect()
      assert(c.length == 399 && c.forall(_.getAs[Long]("n_tok") == 1L),
        s"x78c must select all 399 one-token docs and drop the giant: ${c.length}")
      assert(p.map(_.toString).toSeq == c.map(_.toString).toSeq,
        "fallback did not reproduce x78c")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dirPath.toFile)
    }
  }

  // ===== x79d incremental winnow refresh ===================================

  test("x79d: refresh reads the published index and drops both twin families") {
    val d = TestSpark.sf0001
    val df = SparkEntry.queries("x79d_winnow_incremental")(spark, d)
    // the O(batch) claim's structural half: the base side of the candidate
    // join is the published 2-column index layout, never a recompute of
    // the standing corpus's fingerprints (LogicalRelation toString omits
    // paths, so walk the relations' file-index roots)
    val scanRoots = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }.mkString(";")
    assert(scanRoots.contains("graft_x79d_index"),
      s"base side must come from the published index layout: $scanRoots")
    val rows = df.collect()
    // exact twins (+4e7 of indexed docs): winnow's >= w+2 shared-run
    // guarantee makes an exact copy a CERTAIN index hit
    val exact = rows.filter(_.getLong(0) >= 40000000L)
    assert(exact.nonEmpty)
    assert(exact.forall(r => r.getAs[Long]("n_base_dups") >= 1L &&
      r.getAs[String]("status") == "dropped"),
      "an exact copy of an indexed doc escaped the index join")
    // end-appended twins (+3e7, ' extra'): content-anchored fingerprints
    // recall an edit-at-the-end copy (every base doc is >= 10 tokens =
    // w+2, so the untouched prefix run shares a fingerprint; J >= 8/9)
    val pert = rows.filter { r =>
      val id = r.getLong(0); id >= 30000000L && id < 40000000L
    }
    assert(pert.nonEmpty)
    assert(pert.forall(_.getAs[String]("status") == "dropped"),
      "a one-token-appended copy escaped the content-anchored blocking")
    // and the refresh is not degenerate: genuinely new docs insert
    assert(rows.exists(_.getAs[String]("status") == "inserted"))
  }

  test("winnow kernel require stays as the backstop for ungated callers") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks: Array[Any] =
      Array.fill((1 << 21) + 2)(UTF8String.fromString("a"))
    val ex = intercept[IllegalArgumentException] {
      graft.functions.WinnowHashes.winnow(new GenericArrayData(toks),
        3, graft.functions.StringPolyHash.DefaultMod,
        graft.functions.WinnowHashes.DefaultWin,
        graft.functions.WinnowHashes.DefaultPosBits)
    }
    assert(ex.getMessage.contains("winnow position domain"))
  }
}
