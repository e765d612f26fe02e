package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Round-6 additions: builder laziness (query construction must run zero
  * Spark jobs — r5 verdict wrong-#1), and the conf-derived scratch default
  * (no machine-local literal path anywhere in src/main — r5 verdict
  * wrong-#2/#3).
  */
class Round6Spec extends SparkSpec {

  test("x9 builder is action-free: zero jobs run before the first action") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // warm the per-path schema cache: the one-time footer-inference job a
    // schema-less read costs is table infrastructure, not x9's builder
    Tables.documents(spark, sf0001)
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = SparkEntry.queries("x9_ngram_jaccard")(spark, sf0001)
      // listener events are posted async (the bus itself is private[spark]);
      // any builder-time action has already returned by here, so a short
      // drain window is enough for its JobStart to reach the listener
      Thread.sleep(1000)
      assert(jobs.get() === 0,
        s"x9 builder ran ${jobs.get()} job(s) at construction time — the " +
          "stop-list decision must live in the plan, not the driver")
      assert(df.count() > 0) // and the plan still executes
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("subword tokenizer: lossless segmentation, greedy longest-match, honest expansion") {
    import graft.functions.SubwordVocab
    // vocab sanity: distinct, and every lowercase letter present so greedy
    // matching can never stall
    assert(SubwordVocab.pieces.distinct.size == SubwordVocab.pieces.size)
    assert(('a' to 'z').forall(c => SubwordVocab.pieces.contains(c.toString)))
    def tok(w: String): Seq[String] = {
      val out = new java.util.ArrayList[String]()
      SubwordVocab.tokenizeWord(w, out)
      scala.jdk.CollectionConverters.ListHasAsScala(out).asScala.toSeq
    }
    // segmentation is lossless: pieces concatenate back to the word
    for (w <- Seq("the", "window", "customer", "stream", "zzqx", "a", ""))
      assert(tok(w).mkString == w, s"lossy segmentation of '$w'")
    // greedy longest-match: a 4-gram in vocab wins over its prefixes
    assert(tok("that") == Seq("that"))
    assert(tok("thata") == Seq("that", "a"))
    // unknown characters fall back to single-char pieces, never throw
    assert(tok("x9!") == Seq("x", "9", "!"))

    val counts = SparkEntry.queries("x38_subword_tokens")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(counts.forall { case (ws, sub) => sub >= ws },
      "a subword count fell below its whitespace count")
    val ratio = counts.map(_._2).sum.toDouble / counts.map(_._1).sum
    assert(ratio > 1.5 && ratio < 4.0,
      s"expansion ratio $ratio outside the honest band — vocab drifted")
  }

  test("x23b packs by the same subword totals x38 reports") {
    val subTotal = SparkEntry.queries("x38_subword_tokens")(spark, sf0001)
      .agg(sum(col("n_subword"))).collect()(0).getLong(0)
    val packTotal = SparkEntry.queries("x23b_pack_subword")(spark, sf0001)
      .agg(sum(col("sum_toks"))).collect()(0).getLong(0)
    assert(subTotal === packTotal,
      "packing budgets and token accounting disagree on the corpus total")
  }

  test("x39 refresh is incremental: index published once, then batch-only work") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // first build publishes the index (the one allowed action per corpus
    // snapshot); run it to completion so the stamp exists
    SparkEntry.queries("x39_incremental_dedup")(spark, sf0001).count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = SparkEntry.queries("x39_incremental_dedup")(spark, sf0001)
      Thread.sleep(1000)
      assert(jobs.get() === 0,
        s"re-building x39 ran ${jobs.get()} job(s) — the published index " +
          "must be reused, not rebuilt")
      // plan audit: the base side is the published fingerprint scan, and
      // fingerprint aggregation runs on the batch side only — base
      // documents are never re-shingled. Formatted mode prints scan
      // Locations, which the logical plan's toString does not.
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("graft_x39_index_"),
        "plan does not read the published index")
      // the expression's physical-plan name is its class prettyName
      // ("shinglehashes" since the r11 fused kernel; "stringpolyhash"
      // before), not the registered SQL alias
      assert(plan.toLowerCase.contains("shinglehashes") ||
             plan.toLowerCase.contains("polyhash"),
        "no batch-side shingle fingerprinting in plan")
      // the batch corpus is scanned 3× (new-crawl slice + two twin
      // slices); a 4th documents scan would mean the base side is being
      // re-fingerprinted instead of read from the index
      val docScans = plan.split("\n").count(l =>
        l.contains("Location") && l.contains("documents.parquet"))
      assert(docScans <= 3,
        s"$docScans document scans — base side may be re-fingerprinting")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("x40: multi-table recall dominates its own single table by construction") {
    val rows = SparkEntry.queries("x40_ann_recall")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // the multi index's candidate set is a strict superset of lsh8's
    // (table 1 IS the 8-plane bucketing), so its hit count can never be
    // lower — the structural claim the key exists to quantify
    assert(rows("multi") >= rows("lsh8"),
      s"multi-table recall ${rows("multi")} fell below its own table-1 ${rows("lsh8")}")
    assert(rows.values.forall(h => h >= 0 && h <= 10))
  }

  test("b1 extraction strips script/style/comments before the generic tag pass") {
    import spark.implicits._
    // the script body's bare '<' would survive (and mangle) a tag-only
    // strip; the b1 chain must remove blocks first. Build one row through
    // the DECLARED key's own pipeline shape and check the visible text.
    val row = SparkEntry.queries("b1_html_extract")(spark, sf0001).limit(1)
    assert(row.count() == 1)
    val doc = Tables.documents(spark, sf0001)
      .orderBy(col("doc_id")).limit(1)
      .select(col("lang"), col("text")).collect()(0)
    val expected = s"doc ${doc.getString(0)} ${doc.getString(1)}"
    val gotHash = SparkEntry.queries("b1_html_extract")(spark, sf0001)
      .orderBy(col("doc_id")).limit(1).select(col("text_hash")).collect()(0).getLong(0)
    val expHash = Seq(expected).toDF("t")
      .select(expr("graft_polyhash(t)")).collect()(0).getLong(0)
    assert(gotHash === expHash,
      "extracted text is not 'doc <lang> <text>' — strip chain misordered or lossy")
  }

  test("x42: the reference-trained LM scores its own distribution above out-of-slice docs") {
    val rows = SparkEntry.queries("x42_lm_score")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // micro-unit probabilities are probabilities: mean per position in [0, 1e6)
    assert(rows.forall { case (_, n, _, mean) => n >= 1 && mean >= 0 && mean < 1000000L })
    // training-slice docs contribute their own bigrams to the model, so
    // their average likelihood must sit strictly above the out-of-slice
    // average — the "fit on a reference distribution" property that
    // separates x42 from corpus-internal scoring (x32)
    val (refDocs, rest) = rows.partition(_._1 % 10 == 0)
    def avgMean(xs: Array[(Long, Long, Long, Long)]): Double =
      xs.map(_._4.toDouble).sum / xs.length
    assert(refDocs.nonEmpty && rest.nonEmpty)
    assert(avgMean(refDocs) > avgMean(rest),
      s"reference slice ${avgMean(refDocs)} did not outscore out-of-slice ${avgMean(rest)}")
  }

  test("x43: codeword vectors self-encode exactly; recall rows stay in range") {
    val enc = SparkEntry.queries("x43_pq_encode")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.length >= 16)
    // each vec_id < 16 IS the codebook in every subspace: its nearest
    // codeword is itself at distance exactly 0, so the packed code is
    // k replicated across all eight 4-bit fields and the error is 0
    enc.filter(_._1 < 16).foreach { case (id, code, err) =>
      assert(code === id * 0x11111111L, s"vec $id did not self-assign: $code")
      assert(err === 0L, s"vec $id self-encode error $err != 0")
    }
    // non-codeword vectors must carry a strictly positive error (a zero
    // would mean an exact duplicate of a codeword — not in this fixture)
    assert(enc.filter(_._1 >= 16).forall(_._3 > 0L))
    val hits = SparkEntry.queries("x43b_pq_adc")(spark, sf0001)
      .collect().map(r => r.getLong(1))
    assert(hits.length === 10 && hits.forall(h => h >= 0 && h <= 5))
    // IVF-PQ: the cell block must actually prune (candidates strictly
    // below the corpus) while recall stays a valid 0..5 count
    val n = Tables.embeddings(spark, sf0001).count()
    val ivfpq = SparkEntry.queries("x44_ivfpq_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ivfpq.length === 10)
    assert(ivfpq.forall { case (nc, h) => nc < n - 1 && h >= 0 && h <= 5 })
  }

  test("Scratch.dir default derives from the warehouse dir, not a literal") {
    val had = spark.conf.getOption("spark.graft.scratchDir")
    try {
      spark.conf.unset("spark.graft.scratchDir")
      val d = Scratch.dir(spark)
      assert(d.endsWith("/graft_scratch"), s"unexpected default: $d")
      assert(d != "/tmp" && !d.startsWith("/tmp/"),
        s"default scratch must not resolve to a machine-local literal: $d")
      // and the conf still wins when set
      spark.conf.set("spark.graft.scratchDir", "/elsewhere")
      assert(Scratch.dir(spark) == "/elsewhere")
    } finally {
      spark.conf.unset("spark.graft.scratchDir")
      had.foreach(spark.conf.set("spark.graft.scratchDir", _))
    }
  }

  test("x45: RRF fusion arithmetic is exact and the sparse ranks are x19's own") {
    val fused = SparkEntry.queries("x45_hybrid_rrf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fused.length === 20)
    assert(fused.map(_._1).distinct.length === 20, "fused ids must be unique")
    // integer replay of the RRF formula from the declared rank columns
    fused.foreach { case (id, rs, rd, rrf) =>
      val expect = (if (rs > 0) 1000000L / (60 + rs) else 0L) +
        (if (rd > 0) 1000000L / (60 + rd) else 0L)
      assert(rrf === expect, s"id $id: rrf $rrf != replay $expect")
      assert(rs > 0 || rd > 0, s"id $id is in neither top-50 list")
    }
    // declared total order: (rrf_micro DESC, id)
    assert(fused.sameElements(fused.sortBy(t => (-t._4, t._1))))
    // sparse ranks are exactly x19's: rank i in the fused output means
    // position i of the BM25 top-50 (one scorer, one source of truth)
    val bm25 = SparkEntry.queries("x19_bm25")(spark, sf0001)
      .collect().map(_.getLong(0))
    fused.filter(_._2 > 0).foreach { case (id, rs, _, _) =>
      assert(bm25(rs.toInt - 1) === id,
        s"fused rank_s $rs claims id $id but x19 has ${bm25(rs.toInt - 1)}")
    }
  }

  test("x46: bloom prune is plan-visible, lossless vs exact x20, and actually prunes") {
    val bloom = SparkEntry.queries("x46_decontam_bloom")(spark, sf0001)
    // the prune must survive optimization into the physical plan
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"),
      "bloom probe missing from the physical plan")
    // no false negatives + exact downstream join ⇒ bit-identical to x20
    val exact = SparkEntry.queries("x20_decontam")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = bloom.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exact && exact.nonEmpty)
    // the filter genuinely cuts shuffle input: pruned strictly below train
    // (x46's builder registered the views and functions above)
    val Array(total, kept) = spark.sql(
      s"""${graft.queries.PipelineOps.decontamCteSql(4)}
         |SELECT (SELECT COUNT(*) FROM train) AS total,
         |       (SELECT COUNT(*) FROM pruned) AS kept""".stripMargin)
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(kept < total, s"bloom kept $kept of $total train shingles — no pruning")
    assert(kept > 0, "bloom pruned everything — filter is broken")
  }

  test("x47: repeat factors are the exact floor of the uniform token budget") {
    val rows = SparkEntry.queries("x47_mixture_weights")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length === rows.length)
    assert(rows.map(_._1).sameElements(rows.map(_._1).sorted))
    val tot = rows.map(_._3).sum
    val target = tot / rows.length // uniform share of the one-corpus budget
    rows.foreach { case (src, _, tokens, share, repeat, epochs, resid) =>
      // floor definition, replayed: largest micro-factor not exceeding target
      assert(repeat * tokens <= 1000000L * target, s"$src over budget")
      assert((repeat + 1) * tokens > 1000000L * target, s"$src not tight")
      assert(share === 1000000L * tokens / tot)
      assert(epochs === repeat / 1000000L && resid === repeat % 1000000L)
      // scheduler contract: whole passes + one Bernoulli fractional pass
      assert(epochs * 1000000L + resid === repeat)
    }
    // rebalancing direction: under-represented domains get repeat > 1 epoch
    val small = rows.minBy(_._3); val big = rows.maxBy(_._3)
    if (small._3 < target) assert(small._5 > 1000000L)
    if (big._3 > target) assert(big._5 < 1000000L)
  }

  test("x47b: the realized schedule is consistent with x47's factors") {
    val factors = SparkEntry.queries("x47_mixture_weights")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6))).toMap
    val applied = SparkEntry.queries("x47b_mixture_apply")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(applied.map(_._1).toSet === factors.keySet)
    applied.foreach { case (src, schedDocs, schedToks) =>
      val (nDocs, tokens, epochs, resid) = factors(src)
      // copies ∈ {epochs, epochs+1} per doc, so the realized totals are
      // bracketed by the whole-epoch floor and ceiling — exactly
      assert(schedDocs >= epochs * nDocs && schedDocs <= (epochs + 1) * nDocs,
        s"$src: $schedDocs docs outside [$epochs, ${epochs + 1}] epochs")
      assert(schedToks >= epochs * tokens && schedToks <= (epochs + 1) * tokens)
      // fractional pass fires for SOME docs iff resid > 0 on a big domain
      if (resid == 0) assert(schedDocs === epochs * nDocs, s"$src: resid=0 but extras")
    }
    // the whole realized budget lands near one corpus-worth of tokens
    // (uniform target × ns domains = tot, up to floor truncation + Bernoulli)
    val tot = factors.values.map(_._2).sum
    val realized = applied.map(_._3).sum
    assert(math.abs(realized - tot).toDouble / tot < 0.25,
      s"realized $realized vs budget $tot — schedule is not budget-shaped")
  }

  test("x41 semantic dedup matches an independent in-test replay of the SemDeDup rule") {
    // full plain-Scala reimplementation (third formulation besides the
    // Spark plan and the DuckDB oracle): IVF assignment, micro-unit
    // centroid, centrality rank, pairwise keep rule
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val pivots = vecs.filter(_._1 < 16)
    val cluster = vecs.map { case (id, e) =>
      // ROW_NUMBER over (pcos DESC, p_id): max cosine, lower pivot id wins ties
      val best = pivots.map { case (pid, pe) => (cos(e, pe), pid) }
        .reduceLeft((p, q) => if (q._1 > p._1 || (q._1 == p._1 && q._2 < p._2)) q else p)
      id -> best._2
    }.toMap
    val dim = vecs.head._2.length
    val centroids = vecs.groupBy { case (id, _) => cluster(id) }.map { case (c, members) =>
      val sums = Array.fill(dim)(0L)
      members.foreach { case (_, e) =>
        var i = 0
        while (i < dim) { sums(i) += math.round(e(i).toDouble * 1000000); i += 1 }
      }
      c -> sums.map(v => (v.toDouble / 1000000.0) / members.length)
    }
    val centrality = vecs.map { case (id, e) =>
      val cent = centroids(cluster(id))
      var dot = 0.0; var nv = 0.0; var i = 0
      while (i < dim) { dot += e(i).toDouble * cent(i); nv += e(i).toDouble * e(i).toDouble; i += 1 }
      id -> dot / math.sqrt(nv)
    }.toMap
    val expected = vecs.flatMap { case (xid, xe) =>
      val partners = vecs.filter { case (yid, ye) =>
        cluster(yid) == cluster(xid) &&
          (centrality(yid) < centrality(xid) ||
            (centrality(yid) == centrality(xid) && yid < xid)) &&
          cos(xe, ye) >= 0.40
      }
      if (partners.isEmpty) None
      else Some(xid -> (cluster(xid), partners.map(_._1).min, partners.length.toLong))
    }.toMap
    val got = SparkEntry.queries("x41_semantic_dedup")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty, "semantic dedup produced no rows — threshold dead")
    assert(got === expected)
    // and the paper's invariant: each cell's least-central member survives
    val minCentral = vecs.groupBy { case (id, _) => cluster(id) }
      .map { case (_, ms) => ms.map(m => (centrality(m._1), m._1)).min._2 }
    minCentral.foreach(id =>
      assert(!got.contains(id), s"least-central vector $id of its cell was dropped"))
  }
}
