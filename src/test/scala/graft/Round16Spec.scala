package graft

import org.apache.spark.sql.functions._

/** Round-16 pins: the bench per-key regression gate (r15 verdict #3 —
  * cross-round "zero regressions" must be a driver-checked field, not a
  * judge hand-diff), and the x79e winnow index merge-back (r15 verdict
  * #2 — x79d decided against the published index but nothing materialized
  * the post-refresh merged index, so a production loop re-published at
  * O(corpus)): blacklist exactness, df-overflow drops, refresh
  * COMPOSITION, and the published-layout scan.
  */
class Round16Spec extends SparkSpec {

  // ===== BenchGate regression rule (r15 verdict #3) ========================

  test("regressedKeys: gate, floor, missing keys, and failure sentinels") {
    val baseline = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "e" -> 0.5)
    val mins = Map(
      "a" -> 2.6,  // 2.6x baseline AND +1.6s — regressed
      "b" -> 0.3,  // 3x baseline but +0.2s < floor — jitter, not flagged
      "c" -> 3.9,  // 1.95x < gate despite +1.9s — not flagged
      "d" -> 9.0,  // no baseline (new key) — unchecked
      "e" -> -1.0) // failure sentinel — the failed count's job
    assert(BenchGate.regressedKeys(mins, baseline) == Seq("a"))
    // empty baseline (file missing/corrupt) disables the gate entirely
    assert(BenchGate.regressedKeys(mins, Map.empty).isEmpty)
  }

  test("regression gate boundary is exclusive on both conjuncts") {
    // exactly 2x: not a regression (strictly-greater rule)
    assert(BenchGate.regressedKeys(
      Map("k" -> 1.0), Map("k" -> 0.5)).isEmpty)
    // exactly +0.5s delta at >2x: not a regression (strictly-greater rule)
    assert(BenchGate.regressedKeys(
      Map("k" -> 0.9), Map("k" -> 0.4)).isEmpty)
    // both strictly cleared: regression
    assert(BenchGate.regressedKeys(
      Map("k" -> 1.01), Map("k" -> 0.4)) == Seq("k"))
  }

  test("parseBaseline round-trips the written shape and rejects garbage") {
    val parsed = BenchGate.parseBaseline("""{"q1a":0.104,"x1":1.700}""")
    assert(parsed == Map("q1a" -> 0.104, "x1" -> 1.7))
    assert(BenchGate.parseBaseline("not json at all").isEmpty)
    // the committed baseline itself must parse and cover the full surface
    val committed = BenchGate.parseBaseline(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("docs/bench_baseline.json")), "UTF-8"))
    assert(committed.size >= 250,
      s"committed baseline has only ${committed.size} keys")
    assert(committed.values.forall(v => v > 0 && v < 60))
  }

  // ===== x79e winnow index merge-back (r15 verdict #2) =====================

  /** Manufactured corpus exercising BOTH merge hazards: a fingerprint
    * over-cap in the base corpus (absent from kept/, present only in the
    * overcap/ blacklist) that re-appears in inserted batch docs, and a
    * fingerprint under-cap in base whose merged df crosses the cap. 60 >
    * WinnowDfCap(50) identical boilerplate-B docs blacklist B's
    * fingerprints; 30 identical boilerplate-C docs keep C's under cap
    * until 25 batch copies push the union df to 55.
    */
  private def mkDocs(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }
  private val boilB = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val boilC = "one two three four five six seven eight nine ten"
  private def uniq(i: Long) = s"unique token stream number n$i for doc n$i plus tail t$i"

  private lazy val baseDocs = mkDocs(
    (1L to 60L).map(i => i -> boilB) ++
      (71L to 100L).map(i => i -> boilC) ++
      (101L to 110L).map(i => i -> uniq(i)))
  private lazy val insDocs = mkDocs(Seq(
    1001L -> boilB, // blacklisted fingerprints arrive in the batch
    1002L -> uniq(1002L)) ++
    (1003L to 1027L).map(i => i -> boilC)) // pushes C over the cap

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("fp_h")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  private def fps(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("fp_h")).collect().map(_.getLong(0)).toSet

  test("winnowMergeIndex == from-scratch, incl. blacklist and df-overflow") {
    val cap = graft.queries.PipelineOps.WinnowDfCap
    val fpBase = graft.queries.PipelineOps.winnowDistinctFp(spark, baseDocs)
    val (keptB, overB) = graft.queries.PipelineOps.winnowCapSplit(spark, fpBase)
    val insFp = graft.queries.PipelineOps.winnowDistinctFp(spark, insDocs)
    // preconditions: the fixture really exercises both hazards
    val overSet = fps(overB)
    assert(overSet.nonEmpty, "fixture broken: no over-cap base fingerprint")
    assert(fps(insFp).intersect(overSet).nonEmpty,
      "fixture broken: no blacklisted fingerprint arrives in the batch")
    val keptSet = fps(keptB)
    val cFps = fps(graft.queries.PipelineOps.winnowDistinctFp(
      spark, mkDocs(Seq(71L -> boilC))))
    assert(cFps.subsetOf(keptSet), "fixture broken: C not kept in base")
    // the merge under test — consumes ONLY the published tables + batch
    // fingerprints, never the base docs' text (the O(batch) claim is the
    // function signature itself)
    val (mk, mo) = graft.queries.PipelineOps.winnowMergeIndex(
      spark, keptB.unionByName(insFp), overB, cap)
    // truth: from-scratch cap split over the merged corpus
    val (tk, to) = graft.queries.PipelineOps.winnowCapSplit(spark,
      graft.queries.PipelineOps.winnowDistinctFp(
        spark, baseDocs.unionByName(insDocs)))
    assert(pairs(mk) == pairs(tk),
      "merged kept pairs differ from a from-scratch publish")
    assert(fps(mo) == fps(to),
      "merged overcap blacklist differs from a from-scratch publish")
    // and the hazards actually bit: B stays out, C dropped by overflow
    assert(fps(mk).intersect(overSet).isEmpty)
    assert(fps(mk).intersect(cFps).isEmpty,
      "df-overflow fingerprints survived the merge")
    assert(cFps.subsetOf(fps(mo)), "overflowed fingerprints must join the blacklist")
  }

  test("refreshes COMPOSE: a second merge against the merged index is exact") {
    val cap = graft.queries.PipelineOps.WinnowDfCap
    val fpBase = graft.queries.PipelineOps.winnowDistinctFp(spark, baseDocs)
    val (keptB, overB) = graft.queries.PipelineOps.winnowCapSplit(spark, fpBase)
    val insFp = graft.queries.PipelineOps.winnowDistinctFp(spark, insDocs)
    val (mk, mo) = graft.queries.PipelineOps.winnowMergeIndex(
      spark, keptB.unionByName(insFp), overB, cap)
    // second refresh: one more blacklisted-B doc, one more C doc (C is in
    // the MERGED blacklist now — only the merged overcap knows that), one
    // genuinely new doc
    val ins2 = mkDocs(Seq(2001L -> boilB, 2002L -> boilC, 2003L -> uniq(2003L)))
    val ins2Fp = graft.queries.PipelineOps.winnowDistinctFp(spark, ins2)
    val (mk2, mo2) = graft.queries.PipelineOps.winnowMergeIndex(
      spark, mk.unionByName(ins2Fp), mo, cap)
    val (tk2, to2) = graft.queries.PipelineOps.winnowCapSplit(spark,
      graft.queries.PipelineOps.winnowDistinctFp(spark,
        baseDocs.unionByName(insDocs).unionByName(ins2)))
    assert(pairs(mk2) == pairs(tk2),
      "second refresh against the merged index diverged from from-scratch")
    assert(fps(mo2) == fps(to2))
  }

  test("x79e reads back the published merged layout and emits both statuses") {
    val d = TestSpark.sf0001
    val df = SparkEntry.queries("x79e_winnow_index_merge")(spark, d)
    // the output flows THROUGH the published merged layout (the oracle
    // then checks the artifact's own content) — walk the scan roots like
    // Round15Spec does for x79d's base index
    val scanRoots = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }.mkString(";")
    assert(scanRoots.contains("graft_x79e_refresh"),
      s"n_fp must come from the published merged layout: $scanRoots")
    val rows = df.collect()
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses == Set("kept", "inserted"))
    // base docs are never dropped by a refresh; inserted ⊆ batch ids
    assert(rows.filter(_.getAs[String]("status") == "inserted")
      .forall(r => r.getLong(0) % 5 == 0 || r.getLong(0) >= 30000000L))
    // fingerprintable docs carry their merged-index fingerprint count
    assert(rows.exists(_.getAs[Long]("n_fp") > 0))
  }

  // ===== x80 graph-routed ANN (r15 verdict #7) ==============================

  test("x80: beam probes exactly B cells per query, candidates stay in-beam") {
    val d = TestSpark.sf0001
    val asg = graft.queries.PipelineOps.trainedAssignShared(spark, d)
    val q = asg.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val beams = graft.queries.PipelineOps.graphBeamCells(spark, d, q).collect()
    val byQ = beams.groupBy(_.getLong(0))
    // the routing cost bound IS the operator's scale claim: exactly B
    // probed cells per query after R rounds, never the whole quantizer
    assert(byQ.size == 10)
    assert(byQ.values.forall(_.length == graft.queries.PipelineOps.GraphBeam))
    val beamSet = beams.map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellOf = asg.select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("x80_ann_graph_beam")(spark, d).collect()
    assert(rows.nonEmpty)
    // every reported neighbor's cell was actually probed by its query's
    // beam — the candidates are routed, not scanned
    assert(rows.forall(r =>
      beamSet((r.getAs[Long]("q_id"), cellOf(r.getAs[Long]("n_id"))))))
    assert(rows.forall(r => r.getAs[Long]("rk") >= 1 && r.getAs[Long]("rk") <= 3))
  }

  test("x40 carries the graphb row beside ivf16t (routing-vs-scanning delta)") {
    val d = TestSpark.sf0001
    val rows = SparkEntry.queries("x40_ann_recall")(spark, d).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Long]("recall_pct")).toMap
    assert(rows.contains("graphb") && rows.contains("ivf16t"))
    // at nlist=16 the beam (B=2 cells) explores most of the tiny graph —
    // the router must not fall below the single-cell scanned quantizer
    // here (as nlist grows this is exactly the measured trade to watch)
    assert(rows("graphb") >= rows("ivf16t"),
      s"graphb ${rows("graphb")} < ivf16t ${rows("ivf16t")}")
  }

  test("WinnowGeomTag embeds all four selection constants") {
    val wh = graft.functions.WinnowHashes
    val tag = graft.queries.PipelineOps.WinnowGeomTag
    assert(tag.contains(s"k${wh.DefaultK}"))
    assert(tag.contains(s"m${graft.functions.StringPolyHash.DefaultMod}"))
    assert(tag.contains(s"w${wh.DefaultWin}"))
    assert(tag.contains(s"p${wh.DefaultPosBits}"))
  }

  // ===== x81: trained data-selection selector (centroid/Rocchio) ==========

  private def mkLabeled(rows: Seq[(Long, String, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private lazy val planted = mkLabeled(
    (0L to 5L).map(i => (100L + i,
      s"the a the quick brown fox number n$i jumps over the lazy dog a the end",
      "en")) ++
    (0L to 5L).map(i => (200L + i,
      s"uno dos tres cuatro cinco seis siete ocho nueve n$i diez once doce",
      "es")))

  test("x81: the centroid selector LEARNS a planted separable signal") {
    val row = queries.PipelineOps.x81TrainOver(spark, planted).collect()(0)
    assert(row.getAs[Long]("n_pos") == 6 && row.getAs[Long]("n_neg") == 6)
    assert(row.getAs[Long]("n_err") == 0) // separates the planted classes
    assert(row.getAs[Long]("w_stop") > 0) // and found the planted feature
    val kept = queries.PipelineOps.x81bScoreOver(spark, planted)
      .filter(col("keep") === 1L).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == (100L to 105L)) // keeps exactly the en docs
    val ev = queries.PipelineOps.x81cEvalOver(spark, planted).collect()(0)
    assert(ev.getAs[Long]("precision_milli") == 1000
      && ev.getAs[Long]("recall_milli") == 1000
      && ev.getAs[Long]("accuracy_milli") == 1000)
  }

  test("x81: a one-class corpus trains without division and drops everything") {
    val oneClass = mkLabeled((1L to 5L).map(i => (i, "uno dos tres", "es")))
    val row = queries.PipelineOps.x81TrainOver(spark, oneClass).collect()(0)
    assert(row.getAs[Long]("n_pos") == 0 && row.getAs[Long]("n_neg") == 5)
    val ev = queries.PipelineOps.x81cEvalOver(spark, oneClass).collect()(0)
    // identical all-negative docs sit AT the (degenerate) centroid: score
    // = -||mn||^2 < 0, so nothing is kept and the guarded ratios return
    // the -1 sentinel instead of an engine-dependent divide-by-zero
    assert(ev.getAs[Long]("tp") == 0 && ev.getAs[Long]("fp") == 0
      && ev.getAs[Long]("tn") == 5)
    assert(ev.getAs[Long]("precision_milli") == -1
      && ev.getAs[Long]("recall_milli") == -1
      && ev.getAs[Long]("accuracy_milli") == 1000)
  }

  test("x81: an empty corpus trains to zero rows (oracle-parity degenerate)") {
    // the oracle's GROUP BY over `FROM f, model` yields 0 groups on an
    // empty corpus; the Spark global-aggregate chain must not emit its
    // 1 all-NULL row (the n_pos + n_neg > 0 guard)
    assert(queries.PipelineOps.x81TrainOver(spark, mkLabeled(Seq.empty)).count() == 0L)
  }

  test("x81d: the operating curve is monotone and anchored at keep-all") {
    val rows = queries.PipelineOps.x81dCurveOver(spark, planted).collect()
    assert(rows.length == 10)
    val kept = rows.map(_.getAs[Long]("n_kept"))
    val thr = rows.map(_.getAs[Long]("threshold"))
    assert(kept.head == 12L) // decile 0 = min score ⇒ keeps the whole corpus
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b }) // tightening
    assert(thr.zip(thr.tail).forall { case (a, b) => a <= b })
    // on the separable planted corpus the top deciles keep only en docs
    val last = rows.last
    assert(last.getAs[Long]("precision_milli") == 1000L)
  }

  // ===== x82: margin-based mutual-NN pair mining (CSLS) ===================

  test("x82: mines exactly the aligned pairs, each endpoint at most once") {
    val s = spark; import s.implicits._
    // six near-orthogonal A-side directions; B side = the same directions
    // slightly perturbed — the planted alignment a_i ↔ b_(10+i)
    def dir(i: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.05f); v(i) = 1.0f; v((i + 1) % 8) += eps; v
    }
    val rows =
      (0 until 6).map(i => (i.toLong, dir(i, 0.0f), 0)) ++
      (0 until 6).map(i => ((10 + i).toLong, dir(i, 0.08f), 9))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val mined = queries.PipelineOps.x82Over(spark, emb).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(mined.toSet == (0 until 6).map(i => (i.toLong, (10 + i).toLong)).toSet)
    // mutual-top-1 means each endpoint appears at most once per side
    assert(mined.map(_._1).distinct.length == mined.length)
    assert(mined.map(_._2).distinct.length == mined.length)
  }

  test("x81: feature domains stay bounded on a monster token") {
    val monster = mkLabeled(Seq(
      (1L, "z" * 500000, "en"), (2L, "the a", "en"), (3L, "uno dos", "es")))
    val f = queries.PipelineOps.selectorFeaturesOver(monster)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(f.getAs[Long]("f_wlen") == 10000L) // capped, not 50,000,000
    assert(f.getAs[Long]("f_ttr") <= 1000L && f.getAs[Long]("f_len") <= 1000L)
    // and the trained threshold stays finite/exact through the cap
    val row = queries.PipelineOps.x81TrainOver(spark, monster).collect()(0)
    assert(math.abs(row.getAs[Long]("threshold")) < 1.0e15.toLong)
  }
}
