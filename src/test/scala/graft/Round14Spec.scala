package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural plan assertions shared by the round-13/14 prefilter pins:
  * string-matching the optimized plan text (" < t#" after the first
  * "Window") broke on any change to plan printing or attribute numbering
  * (r13 ADVICE) — these walk the logical plan instead.
  */
private[graft] object PlanChecks {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan}
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => WindowNode}

  /** True iff the subtree BELOW some Window node carries a `x < t`
    * comparison against the threshold attribute — as a Filter node or
    * folded into a join condition (both shapes bound the window's input,
    * which is the property the x76/x77b keys exist for).
    */
  def hasThresholdBelowWindow(df: DataFrame): Boolean = {
    def subtreeHasThreshold(p: LogicalPlan): Boolean =
      p.collect { case n => n }.exists(n => n.expressions.exists(_.exists {
        case LessThan(_: AttributeReference, t: AttributeReference) =>
          t.name == "t"
        case _ => false
      }))
    df.queryExecution.optimizedPlan
      .collect { case w: WindowNode => w }
      .exists(w => subtreeHasThreshold(w.child))
  }

  def windowCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case w: WindowNode => w }.size
}

/** Round-14 pins: the x77b weighted-prefilter (the last r13 weak mark),
  * the mid-text positive-control twin slice, the HostCal memory leg, and
  * the bench record's cached_artifact self-description.
  */
class Round14Spec extends SparkSpec {

  test("x77b: bit-identical to x77, threshold filter below the ranking window") {
    val d = TestSpark.sf0001
    val x77b = SparkEntry.queries("x77b_weighted_prefilter")(spark, d)
    val x77 = SparkEntry.queries("x77_weighted_sample")(spark, d)
    assert(x77b.collect().map(_.toString).toSeq ==
      x77.collect().map(_.toString).toSeq, "x77b selection diverged from x77")
    // the load-bearing plan property: the pri < t prefilter bounds the
    // ranking window's input, so a 10⁷-row hot stratum sorts ~8k rows in
    // the window task, not the stratum — the straggler x77 was weak for
    assert(PlanChecks.hasThresholdBelowWindow(x77b),
      s"no priority-threshold filter below the ranking window:\n${x77b.queryExecution.optimizedPlan}")
    // both branches present: the prefiltered rank + the shortfall fallback
    assert(PlanChecks.windowCount(x77b) >= 2,
      x77b.queryExecution.optimizedPlan.toString)
    // and x77 itself must NOT carry the prefilter (it is the unbounded
    // baseline the refinement is measured against)
    assert(!PlanChecks.hasThresholdBelowWindow(x77))
  }

  test("x77b: survives NULL-lang and NULL-text strata (same contract as x76)") {
    import spark.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("graft_nulls77b")
    val dir = dirPath.toString
    try {
      val rows = (1L to 60L).map { i =>
        val lang = if (i % 3 == 0) null else if (i % 3 == 1) "en" else "fr"
        val text = if (i == 7L) null
          else s"tok${i} " + Seq.fill((i % 5).toInt + 1)("w").mkString(" ")
        (i, text, lang, "src", Option(text).map(_.length.toLong).getOrElse(0L))
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val base = SparkEntry.queries("x77_weighted_sample")(spark, dir)
        .collect().map(_.toString).sorted
      val pre = SparkEntry.queries("x77b_weighted_prefilter")(spark, dir)
        .collect().map(_.toString).sorted
      assert(base.exists(_.contains("null")), "fixture lost its NULL stratum")
      assert(pre.sameElements(base),
        s"x77b diverged on a null-bearing corpus: ${base.length} vs ${pre.length}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dirPath.toFile)
    }
  }

  test("x77b: a shortfall stratum falls back to the exact full ranking") {
    // manufacture the shortfall regime the left-semi branch exists for:
    // one doc carries ~all of the stratum's weight, so the weight-sum
    // threshold t = 8k·10⁹·mod div Σw collapses and fewer than min(k, n)
    // docs survive the prefilter — the output must STILL be exactly the
    // top-k by (pri, doc_id), i.e. x77's own selection
    import spark.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("graft_short77b")
    val dir = dirPath.toString
    try {
      val rows = (1L to 300L).map { i =>
        // 20 colossal docs (10⁶ tokens each) + 280 one-token docs:
        // Σw ≈ 2·10⁷ collapses t = 8k·10⁹·mod div Σw to ~2·10¹⁰, so a
        // one-token doc survives only if its hash < ~20 (polyhash of
        // short id strings sits near 50+) — survivors ≈ the 20 heavy
        // docs (whose capped survival probability is the cause: they
        // carry the weight mass but can each only survive once)
        val text = if (i <= 20L) Seq.fill(1000000)("w").mkString(" ")
                   else s"b$i"
        (i, text, "en", "src", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val (_, _, _, short) = graft.queries.CorpusOps.x77bPrefilter(spark, dir)
      assert(short.count() >= 1, "fixture failed to trigger the shortfall branch")
      val base = SparkEntry.queries("x77_weighted_sample")(spark, dir)
        .collect().map(_.toString).toSeq
      val pre = SparkEntry.queries("x77b_weighted_prefilter")(spark, dir)
        .collect().map(_.toString).toSeq
      assert(pre == base, "fallback branch did not reproduce x77 exactly")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dirPath.toFile)
    }
  }

  test("x72b/x72d: the mid-text slice is the matrix's positive control") {
    val d = TestSpark.sf0001
    for (key <- Seq("x72b_snm_recall", "x72d_multikey_recall")) {
      val rows = SparkEntry.queries(key)(spark, d).collect()
        .filter(_.getString(0) == "mid_perturbed")
      val truth = rows.map(_.getLong(2)).sum
      val found = rows.map(_.getLong(3)).sum
      assert(truth >= 30L, s"$key: mid-text truth too thin to audit: $truth")
      // an interior edit moves NEITHER 24-char sort key (the snmMidGate
      // makes that structural, not statistical), so every SNM form must
      // recall the slice essentially fully — if this fails, the miss is
      // in the ENGINE's windowing, not the fixture
      assert(found * 1000000L / truth >= 900000L,
        s"$key: mid-text slice recalled only $found/$truth — " +
          "an intact-key pair escaped the window")
    }
  }

  test("x78: apportionment is budget-exact and genuinely tempered") {
    val d = TestSpark.sf0001
    val rows = SparkEntry.queries("x78_temperature_sample")(spark, d).collect()
    val corpus = Tables.documents(spark, d).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val alloc = rows.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("k_alloc")).head }
    // largest-remainder apportionment sums EXACTLY to K when no stratum
    // clamps (none does at sf0.001) — the floor-only form undershoots
    assert(rows.length == 400, s"budget not exact: ${rows.length}")
    assert(alloc.values.sum == 400L)
    // the temperature property: allocation ordered like the counts but
    // SUBLINEAR — the head language takes fewer seats than its natural
    // share, the tail more (α = 0.5 vs α = 1)
    val (headLang, headN) = corpus.maxBy(_._2)
    val (tailLang, tailN) = corpus.minBy(_._2)
    assert(alloc(headLang) >= alloc(tailLang), "allocation not monotone")
    val total = corpus.values.sum
    assert(alloc(headLang).toDouble / 400 < headN.toDouble / total,
      s"head lang not down-weighted: ${alloc(headLang)}/400 vs $headN/$total")
    assert(alloc(tailLang).toDouble / 400 > tailN.toDouble / total,
      s"tail lang not up-weighted: ${alloc(tailLang)}/400 vs $tailN/$total")
    // per-stratum selection honors the allocation exactly
    rows.groupBy(_.getString(0)).foreach { case (l, rs) =>
      assert(rs.length.toLong == alloc(l) &&
        rs.map(_.getAs[Long]("rn")).max == alloc(l),
        s"stratum $l selected ${rs.length} of ${alloc(l)}")
    }
  }

  test("x78: leftover-seat tie-break ranks NULL-lang strata LAST (oracle order)") {
    // three equal strata force a 3-way remainder tie with exactly ONE
    // leftover seat (400 mod 3 = 1); Hamilton's tie-break is lang order
    // with NULLS LAST (DuckDB's default) — Spark's bare asc sorts NULLs
    // FIRST, so without asc_nulls_last the seat would go to the NULL
    // stratum and the two engines would allocate differently on any
    // rem-tied NULL-bearing corpus (review finding)
    import spark.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("graft_tie78")
    val dir = dirPath.toString
    try {
      // 150 docs per stratum: allocations (134/133/133) stay below the
      // stratum sizes, so the clamp cannot mask the tie-break outcome
      val rows = (1L to 450L).map { i =>
        val lang = (i % 3) match {
          case 0 => "aa"; case 1 => "bb"; case _ => null
        }
        (i, s"tok$i text words", lang, "src", 12L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("x78_temperature_sample")(spark, dir).collect()
      val alloc = out.groupBy(r => Option(r.getString(0)))
        .map { case (l, rs) => l -> rs.map(_.getAs[Long]("k_alloc")).head }
      assert(alloc(Some("aa")) == 134L && alloc(Some("bb")) == 133L &&
        alloc(None) == 133L,
        s"tie-break allocation wrong (NULL must rank last): $alloc")
      assert(out.length == 400)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dirPath.toFile)
    }
  }

  test("x78: a stratum smaller than its seat allocation clamps, not fails") {
    // the documented undershoot path: a tiny stratum whose sqrt weight
    // earns more seats than it has docs yields its shortfall (no
    // driver-side redistribution); every doc of the tiny stratum is
    // selected, and the other strata still receive exactly their seats
    import spark.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("graft_clamp78")
    val dir = dirPath.toString
    try {
      // two strata: 'aa' has 3 docs but sqrt-weight share ≈ 3.4% of 400
      // seats ≈ 13 > 3 → clamps to 3; 'bb' takes its full allocation
      val rows = (1L to 2503L).map { i =>
        val lang = if (i <= 3L) "aa" else "bb"
        (i, s"tok$i text", lang, "src", 9L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("x78_temperature_sample")(spark, dir).collect()
      val aa = out.filter(_.getString(0) == "aa")
      val bb = out.filter(_.getString(0) == "bb")
      assert(aa.length == 3, s"tiny stratum not fully selected: ${aa.length}")
      assert(aa.forall(_.getAs[Long]("k_alloc") == 3L), "k_alloc did not clamp to n_docs")
      // bb's allocation is its unclamped Hamilton share (≥ floor seats);
      // total undershoots 400 by exactly the clamped shortfall
      assert(bb.length.toLong == bb.head.getAs[Long]("k_alloc"))
      assert(out.length < 400, "clamp did not reduce the total")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dirPath.toFile)
    }
  }

  test("x79: winnow density near theory; x79c covers SNM's irreducible cell") {
    val d = TestSpark.sf0001
    // density self-check: expected 2/(w+1) ≈ 222k ppm of grams on natural
    // text — a selection bug (wrong frame, wrong tie rule) moves this far
    val prof = SparkEntry.queries("x79_winnow_fingerprint")(spark, d).collect()
    val meanPpm = prof.map(_.getLong(3)).sum / prof.length
    assert(meanPpm > 120000 && meanPpm < 350000,
      s"winnow density $meanPpm ppm far from the 2/(w+1) theory band")
    // the decision-table claim: fingerprints are content-anchored, so the
    // both-ends twins BOTH SNM forms irreducibly miss (x72d: ~2%) must
    // recall here — and the positive-control mid slice stays full
    val rows = SparkEntry.queries("x79c_winnow_recall")(spark, d).collect()
    def slice(n: String) = rows.filter(_.getString(0) == n)
    for (s <- Seq("both_perturbed", "mid_perturbed", "prefix_perturbed",
        "suffix_perturbed", "base")) {
      val (t, f) = (slice(s).map(_.getLong(2)).sum, slice(s).map(_.getLong(3)).sum)
      assert(t > 0, s"slice $s lost its truth")
      assert(f * 1000000L / t >= 900000L,
        s"winnow join under-recalled slice $s: $f/$t — " +
          "position-robustness is the strategy's whole claim")
    }
  }

  test("WinnowHashes kernel selects exactly what the frame spec selects") {
    // the codegen'd O(m) deque kernel replaced the min-over-frame window
    // form mid-round; the oracle still replays the frame form, and this
    // differential pins the two Spark-side forms equal on the real corpus
    // PLUS the edge shapes the corpus may not exercise: sub-window docs
    // (m < w), exact-window docs (m == w), and all-tied hashes (repeated
    // tokens — the rightmost-of-ties rule)
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    def frameForm(corpus: DataFrame): Seq[String] = {
      graft.functions.ShingleHashes.register(spark)
      val enc = 1L << 21
      val grams = corpus
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          posexplode(expr("graft_shingle_hashes_all(toks)")).as(Seq("pos", "h")))
      val wcnt = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val wframe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, 7)
      grams
        .withColumn("m", count(lit(1)).over(wcnt))
        .withColumn("mk",
          min(expr(s"h * ${enc}L + (${enc - 1}L - pos)")).over(wframe))
        .filter(col("pos") <= greatest(lit(0L), col("m") - 8))
        .select(col("doc_id"),
          expr(s"mk div ${enc}L").as("fp_h"),
          expr(s"${enc - 1}L - (mk % ${enc}L)").as("fp_pos"))
        .distinct()
        .collect().map(_.toString).sorted.toSeq
    }
    def kernelForm(corpus: DataFrame): Seq[String] =
      graft.queries.PipelineOps.winnowFingerprints(spark, corpus)
        .select(col("doc_id"), col("fp_h"), col("fp_pos"))
        .collect().map(_.toString).sorted.toSeq
    val real = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    assert(kernelForm(real) == frameForm(real), "kernel diverged on the corpus")
    val edges = Seq(
      (1L, "a b c"),                            // m=1 (single truncated window)
      (2L, "a b c d e f"),                      // m=4 < w
      (3L, "a b c d e f g h i j"),              // m=8 == w (one full window)
      (4L, "w w w w w w w w w w w w"),          // all grams tied
      (5L, "x y x y x y x y x y x y x y"),      // period-2 ties
      (6L, (1 to 40).map(i => s"t${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    assert(kernelForm(edges) == frameForm(edges), "kernel diverged on edges")
  }

  test("HostCal memory leg: work is checksum-pinned and deterministic") {
    val (s1, c1) = HostCal.memRun()
    val (s2, c2) = HostCal.memRun()
    // chained fold, not XOR: the per-sweep FNV values are pass-independent
    // (the buffer never changes), so an XOR fold pair-cancels to a
    // near-zero constant that pins none of the work — the chained fold is
    // order- and pass-sensitive
    assert(c1 == HostCal.MemChecksum, s"mem kernel checksum drifted: $c1")
    assert(c2 == HostCal.MemChecksum)
    assert(s1 > 0 && s2 > 0)
    assert(HostCal.MemNominalSec > 0)
  }

  test("bench stats carry the cached_artifact flag; ArtifactLog wiring") {
    // format pin: the per-key stats entry self-describes artifact reads
    assert(BenchGate.statJson("k", 1.0, 2.0, cachedArtifact = true)
      .contains("\"cached_artifact\":true"))
    assert(BenchGate.statJson("k", 1.0, 2.0, cachedArtifact = false)
      .contains("\"cached_artifact\":false"))
    val d = TestSpark.sf0001
    // an artifact-backed key raises the flag during its timed run…
    Tables.ArtifactLog.reset()
    assert(!Tables.ArtifactLog.wasTouched)
    SparkEntry.queries("x68_also_bought")(spark, d).count()
    assert(Tables.ArtifactLog.wasTouched,
      "x68 read its shared scored-pair artifact without raising the flag")
    // …and a computed-plan key does not
    Tables.ArtifactLog.reset()
    SparkEntry.queries("q1a_scan_filter")(spark, d).count()
    assert(!Tables.ArtifactLog.wasTouched,
      "q1a flagged as artifact-backed — the flag lost its meaning")
  }
}
