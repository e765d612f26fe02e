package graft

import graft.queries.EventAnalytics
import org.apache.spark.sql.functions._

/** Round-10 pins: the event-analytics family (e1–e5) — funnel ordering,
  * cohort-retention triangle shape, rolling-distinct window math,
  * rank-based winsorization invariants, and the transition-matrix row
  * sums — plus plan hygiene (one user-keyed exchange serving all of e5's
  * windows, broadcast boundary join in e4).
  */
class Round10Spec extends SparkSpec {

  private val d = TestSpark.sf0001

  test("e1 funnel stages are monotonically non-increasing") {
    val rows = EventAnalytics.e1Funnel(spark, d)
      .orderBy(col("stage")).collect()
    assert(rows.length === 3)
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel widened downstream: ${counts.toSeq}")
    assert(counts(0) > 0, "no user ever viewed — fixture assumption broke")
  }

  test("e2 retention: offset-0 cell covers the whole cohort") {
    val ret = EventAnalytics.e2Retention(spark, d)
    // every user is active in their own cohort week by construction, so
    // the offset-0 diagonal must dominate every later offset of its row
    val byCohort = ret.collect()
      .groupBy(_.getAs[String]("cohort_week"))
    byCohort.foreach { case (wk, rows) =>
      val at = rows.map(r =>
        r.getAs[Long]("week_offset") -> r.getAs[Long]("n_active")).toMap
      assert(at.contains(0L), s"cohort $wk missing its own week")
      assert(at.forall { case (_, n) => n <= at(0L) },
        s"cohort $wk has a later week larger than its own: $at")
    }
  }

  test("e3 rolling distinct: 7-day count bounded by day count and total") {
    val roll = EventAnalytics.e3RollingDistinct(spark, d).collect()
    val total = Tables.events(spark, d)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    roll.foreach { r =>
      val n1 = r.getAs[Long]("n_day")
      val n7 = r.getAs[Long]("n_7day")
      assert(n7 >= n1, s"${r.getString(0)}: rolling $n7 < same-day $n1")
      assert(n7 <= total, s"${r.getString(0)}: rolling $n7 > population $total")
    }
    // trailing-window identity: days with no same-day activity only occur
    // past the data's end (the explode's +6 tail), never inside the range
    val inRange = roll.filter(_.getAs[Long]("n_day") > 0).map(_.getString(0))
    assert(inRange.nonEmpty)
  }

  test("e4 winsorize: boundaries clip exactly the declared tails") {
    val w = EventAnalytics.e4Winsorize(spark, d).collect()
    assert(w.length > 0)
    w.foreach { r =>
      val n = r.getAs[Long]("n")
      val k = math.floor(0.05 * n).toLong
      assert(r.getAs[Long]("lo_vm") <= r.getAs[Long]("hi_vm"))
      // rank-selection semantics: strictly-below-lo rows number at most k
      // (ties at the boundary value stay unclipped), same above hi
      assert(r.getAs[Long]("n_clip_lo") <= k,
        s"${r.getString(0)}: clipped ${r.getAs[Long]("n_clip_lo")} > k=$k")
      assert(r.getAs[Long]("n_clip_hi") <= k)
    }
  }

  test("e5 transition matrix: from-state totals sum the matrix rows") {
    val m = EventAnalytics.e5Transitions(spark, d).collect()
    val byFrom = m.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (f, rows) =>
      val sum = rows.map(_.getAs[Long]("n_trans")).sum
      rows.foreach { r =>
        assert(r.getAs[Long]("n_from_total") === sum,
          s"$f: declared total ${r.getAs[Long]("n_from_total")} != row sum $sum")
      }
    }
  }

  test("e5 plan: one user-keyed exchange serves session and lead windows") {
    val plan = EventAnalytics.e5Transitions(spark, d)
      .queryExecution.executedPlan.toString
    // the (user_id, sid) window must reuse the user_id partitioning, not
    // add a second pre-aggregation exchange over the raw events
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"e5 plan repartitions $exchanges times — windows not sharing the " +
        s"user_id exchange:\n${plan.take(3000)}")
  }

  test("e4 plan: boundary join broadcasts the per-group bounds") {
    val plan = EventAnalytics.e4Winsorize(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"e4 bounds join is not broadcast:\n${plan.take(3000)}")
  }

  test("dq1 profile: null accounting and distinct bounds are consistent") {
    val p = graft.queries.QualityOps.dq1Profile(spark, d).collect()
    assert(p.length === 6)
    p.foreach { r =>
      val n = r.getAs[Long]("n_total")
      val nulls = r.getAs[Long]("n_null")
      val dist = r.getAs[Long]("n_distinct")
      assert(nulls >= 0 && nulls <= n)
      assert(dist <= n - nulls,
        s"${r.getString(0)}: $dist distinct > ${n - nulls} non-null")
      // exactly one of the (num, str) min/max pairs is populated
      val hasNum = !r.isNullAt(r.fieldIndex("min_num"))
      val hasStr = !r.isNullAt(r.fieldIndex("min_str"))
      assert(hasNum ^ hasStr, s"${r.getString(0)}: num/str pair confusion")
    }
    // o_orderkey is the primary key: zero nulls, all-distinct
    val pk = p.find(_.getString(0) == "o_orderkey").get
    assert(pk.getAs[Long]("n_null") === 0L)
    assert(pk.getAs[Long]("n_distinct") === pk.getAs[Long]("n_total"))
  }

  test("dq1 plan: the whole profile is ONE aggregate subtree (one scan)") {
    val plan = graft.queries.QualityOps.dq1Profile(spark, d)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(plan).length
    assert(scans <= 1,
      s"dq1 profile re-scans the table $scans times — the explode-from-one-" +
        s"aggregate shape regressed to per-column union branches")
  }

  test("dq2 referential integrity: TPC-H star edges have zero orphans") {
    val rows = graft.queries.QualityOps.dq2Referential(spark, d).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_child") > 0, s"${r.getString(0)}: empty child")
      assert(r.getAs[Long]("n_orphan") === 0L,
        s"${r.getString(0)}: ${r.getAs[Long]("n_orphan")} orphans in a " +
          s"referentially-intact fixture")
    }
  }

  test("dq3 constraints: clean fixture, and every rule actually checked rows") {
    val rows = graft.queries.QualityOps.dq3Constraints(spark, d).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_checked") > 0,
        s"${r.getString(0)}: vacuous rule (0 rows checked)")
      assert(r.getAs[Long]("n_violation") === 0L,
        s"${r.getString(0)}: ${r.getAs[Long]("n_violation")} violations")
    }
  }

  test("dq5 reconcile: coverage accounting ties out against the raw tables") {
    val r = graft.queries.QualityOps.dq5Reconcile(spark, d).collect()
    assert(r.length === 1)
    val row = r.head
    val nOrders = row.getAs[Long]("n_orders")
    val noLi = row.getAs[Long]("n_no_lineitems")
    assert(nOrders === Tables.orders(spark, d).count())
    // orders without lineitems = orders minus distinct child keys
    val liKeys = Tables.lineitem(spark, d)
      .select(col("l_orderkey")).distinct().count()
    assert(noLi === nOrders - liKeys)
    // bucket containment: exact ⊆ within-a-cent ⊆ joined
    val nExact = row.getAs[Long]("n_exact")
    val nCent = row.getAs[Long]("n_within_1c")
    assert(nExact <= nCent && nCent <= nOrders - noLi)
    // drift stats are consistent: a nonzero max implies a nonzero sum
    val maxD = row.getAs[Long]("max_abs_diff_micros")
    val sumD = row.getAs[Long]("sum_abs_diff_micros")
    assert(maxD >= 0 && sumD >= maxD)
  }

  test("dq6 k-anonymity: classes partition the table, flags match counts") {
    val rows = graft.queries.QualityOps.dq6KAnonymity(spark, d).collect()
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total === Tables.customer(spark, d).count(),
      "equivalence classes do not partition the table")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") === (r.getAs[Long]("n_members") < 10),
        s"flag/count disagreement at ${r.get(0)}/${r.get(1)}")
    }
    // the sf0.001 fixture genuinely exercises both sides of the flag
    assert(rows.exists(_.getAs[Boolean]("at_risk")), "no at-risk class")
  }

  test("dq7 KS drift: statistic matches a driver-side exact recomputation") {
    val r = graft.queries.QualityOps.dq7KsDrift(spark, d).collect().head
    val (n1, n2) = (r.getAs[Long]("n_base"), r.getAs[Long]("n_compare"))
    val num = r.getAs[Long]("ks_num")
    assert(r.getAs[Long]("ks_den") === n1 * n2)
    assert(num >= 0 && num <= n1 * n2, "KS statistic outside [0,1]")
    assert(r.getAs[Long]("ks_micros") === num * 1000000L / (n1 * n2))
    assert(r.getAs[Boolean]("drifted") === (num * 10 > n1 * n2))
    // independent exact recomputation from the raw fixture (bounded: the
    // documents table is test-sized here; the operator itself never
    // collects)
    val docs = Tables.documents(spark, d)
      .select(col("n_chars"), (col("lang") === "en").as("en")).collect()
      .map(x => (x.getLong(0), x.getBoolean(1)))
    val a = docs.filter(_._2).map(_._1).sorted
    val b = docs.filterNot(_._2).map(_._1).sorted
    assert(n1 === a.length.toLong && n2 === b.length.toLong)
    val vals = (a ++ b).distinct.sorted
    val expect = vals.map { v =>
      math.abs(a.count(_ <= v).toLong * n2 - b.count(_ <= v).toLong * n1)
    }.max
    assert(num === expect, s"KS numerator $num != exact $expect")
  }

  test("fe1 scale histogram: deciles partition each group, ppm in range") {
    val rows = graft.queries.FeatureOps.fe1ScaleHistogram(spark, d).collect()
    rows.foreach { r =>
      val dec = r.getAs[Long]("decile")
      assert(dec >= 0 && dec <= 9)
      // decile d covers ppm in [d·100000, (d+1)·100000) (decile 9 also
      // takes the max element's 1000000), so the per-bucket checksum is
      // bounded by count × bucket ceiling
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("sum_ppm") >= dec * 100000L * n)
      assert(r.getAs[Long]("sum_ppm") <= (dec + 1L) * 100000L * n)
    }
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    val expected = Tables.events(spark, d).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.toMap === expected, "histogram loses rows")
  }

  test("fe2 target encode: smoothing pulls every category toward the prior") {
    val rows = graft.queries.FeatureOps.fe2TargetEncode(spark, d).collect()
    assert(rows.length === 5)
    // raw per-category mean vs encoded: the encoding must lie between the
    // raw category mean and the global mean (that's what smoothing does)
    val ev = Tables.events(spark, d)
      .select(col("event_type"), expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gmean = ev.map(_._2).sum / ev.length
    rows.foreach { r =>
      val cat = r.getString(0)
      val vs = ev.filter(_._1 == cat).map(_._2)
      val cmean = vs.sum / vs.length
      val enc = r.getAs[Long]("enc_micros")
      val (lo, hi) = (math.min(cmean, gmean), math.max(cmean, gmean))
      // floor-division slack of ±1 on each of the three integer divisions
      assert(enc >= lo - 2 && enc <= hi + 2,
        s"$cat: enc $enc outside [$lo, $hi] (raw $cmean, prior $gmean)")
    }
  }

  test("fe3 feature hash: bucket profile conserves the token stream") {
    val rows = graft.queries.FeatureOps.fe3FeatureHash(spark, d).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 64)
      assert(math.abs(r.getAs[Long]("net_sign")) <= r.getAs[Long]("n_tokens"))
    }
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 1).count()
    assert(total === expected, "hashing dropped or duplicated tokens")
  }

  test("dq8 volume anomaly: baseline excludes the judged day, day one unflagged") {
    val rows = graft.queries.QualityOps.dq8VolumeAnomaly(spark, d)
      .collect().sortBy(_.getString(0))
    assert(rows.length > 8)
    // day one has no trailing baseline and must be explicitly unflagged
    assert(rows.head.isNullAt(rows.head.fieldIndex("trailing_med")))
    assert(!rows.head.getAs[Boolean]("is_spike") && !rows.head.getAs[Boolean]("is_drop"))
    // recompute each trailing median driver-side from the emitted counts
    val ns = rows.map(_.getAs[Long]("n_events"))
    rows.zipWithIndex.drop(1).foreach { case (r, i) =>
      val win = ns.slice(math.max(0, i - 7), i).sorted
      val med =
        if (win.length % 2 == 1) win(win.length / 2).toDouble
        else (win(win.length / 2 - 1) + win(win.length / 2)) / 2.0
      assert(r.getAs[Double]("trailing_med") === med,
        s"day ${r.getString(0)}: median ${r.getAs[Double]("trailing_med")} != $med")
      assert(r.getAs[Boolean]("is_spike") === (ns(i) * 2 > med * 3))
      assert(r.getAs[Boolean]("is_drop") === (ns(i) * 2 < med))
    }
  }

  test("x61 vocab coverage: totals reconcile with x38's per-doc accounting") {
    val cov = graft.queries.PipelineOps.x61VocabCoverage(spark, d).collect()
    cov.foreach { r =>
      val (np, nf, nw) = (r.getAs[Long]("n_pieces"),
        r.getAs[Long]("n_fallback"), r.getAs[Long]("n_words"))
      assert(nf >= 0 && nf <= np)
      assert(r.getAs[Long]("coverage_ppm") === (np - nf) * 1000000L / np)
      assert(r.getAs[Long]("ppw_ppm") === np * 1000000L / nw)
      // greedy longest-match emits ≥1 piece per non-empty word and ≤1
      // piece per character: 1 ≤ pieces/word ≤ max word length
      assert(np >= nw || nw == 0)
    }
    // corpus totals must equal x38's per-doc sums (same tokenizer, same
    // corpus — if these drift, one of the two paths changed alone)
    val x38 = graft.queries.PipelineOps.x38SubwordTokens(spark, d)
      .agg(sum(col("n_ws")), sum(col("n_subword"))).head()
    assert(cov.map(_.getAs[Long]("n_words")).sum === x38.getLong(0))
    assert(cov.map(_.getAs[Long]("n_pieces")).sum === x38.getLong(1))
  }

  test("dq4 completeness: contiguous spine, totals preserved") {
    val rows = graft.queries.QualityOps.dq4Completeness(spark, d).collect()
    val days = rows.map(_.getString(0))
    assert(days.length > 1)
    // spine is gap-free: consecutive ISO dates differ by exactly one day
    days.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.LocalDate.parse(a).plusDays(1) ===
        java.time.LocalDate.parse(b), s"spine hole between $a and $b")
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val expected = Tables.events(spark, d).count()
    assert(total === expected, s"zero-fill changed the total: $total != $expected")
  }

  /** The r10 group-key-narrowing lever: concat(k1,'-',k2[,'-',k3]) over
    * non-negative integers is injective, so grouping by the raw integer
    * columns must be bit-identical to grouping by the string — on every
    * q2 key that carries the lever, both flag settings.
    */
  test("q2 intkeys lever: narrowed group key is bit-identical on q2e/f/g") {
    def fp(df: org.apache.spark.sql.DataFrame): Long = {
      val h = df.withColumn("__fp", xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)))
        .agg(expr("bit_xor(__fp)")).head()
      if (h.isNullAt(0)) 0L else h.getLong(0)
    }
    for (k <- Seq("q2e_substr_agg", "q2f_substr_agg", "q2g_substr_agg")) {
      val narrow = fp(SparkEntry.queries(k)(spark, d))
      try {
        spark.conf.set("spark.graft.q2.intkeys", "false")
        val stringKeyed = fp(SparkEntry.queries(k)(spark, d))
        assert(narrow === stringKeyed,
          s"$k: intkeys lever changed the result")
      } finally spark.conf.unset("spark.graft.q2.intkeys")
    }
  }

  test("e6 SCD2: contiguous versions, chained intervals, one current row " +
       "per user, no same-attr adjacent versions, one user exchange") {
    val df = EventAnalytics.e6Scd2(spark, d)
    // plan hygiene: the lag/sum windows, the (user_id, version) agg, and
    // the lead() interval close must all ride ONE user_id-keyed exchange
    val exchanges = df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges")
    val byUser = df.collect().groupBy(_.getAs[Long]("user_id"))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ===
        (1L to sorted.length.toLong), s"user $u versions not contiguous")
      // half-open intervals chain: valid_to == successor's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"),
            s"user $u: interval chain broken at version ${a.getAs[Long]("version")}")
          assert(a.getAs[String]("attr") !== b.getAs[String]("attr"),
            s"user $u: adjacent versions share attr — run collapse failed")
        case _ => ()
      }
      assert(rows.count(_.getAs[Boolean]("is_current")) === 1,
        s"user $u: not exactly one current version")
      assert(sorted.last.getAs[Boolean]("is_current"),
        s"user $u: current flag not on the last version")
    }
    // every event is accounted for by exactly one version row
    val total = byUser.values.flatten.map(_.getAs[Long]("n_events")).sum
    assert(total === Tables.events(spark, d).count())
  }

  test("fe4 folds: complete partition of the corpus, in-range folds, " +
       "per-lang shares floor-sum to at most 1e6") {
    val rows = graft.queries.FeatureOps.fe4CrossvalFolds(spark, d).collect()
    assert(rows.forall { r =>
      val f = r.getAs[Long]("fold"); f >= 0 && f < 5 })
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, d).count(),
      "fold assignment dropped or duplicated documents")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val share = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(share <= 1000000L && share > 1000000L - rs.length,
        s"$lang: floor-ppm shares sum to $share")
    }
  }

  /** The r10 replication pushdown: q2g's amplification explode must sit
    * ABOVE the repartition exchange (the shuffle moves natural rows, the
    * replicas are generated locally after), and the inner aggregate still
    * groups at full amplified cardinality.
    */
  test("q2g replication pushdown: explode above the exchange") {
    val plan = SparkEntry.queries("q2g_substr_agg")(spark, d)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val gen = lines.indexWhere(_.contains("Generate explode"))
    val exch = lines.indexWhere(l => l.contains("Exchange") &&
      (l.contains("REPARTITION_BY_NUM") || l.contains("REPARTITION_BY_COL")))
    assert(gen >= 0, s"no explode in the plan:\n$plan")
    assert(exch >= 0, s"no repartition exchange in the plan:\n$plan")
    // tree prints root-first: the generate must be ABOVE (closer to the
    // agg) than the exchange, i.e. appear EARLIER in the printout
    assert(gen < exch,
      s"explode sits below the exchange — amplified rows are shuffled:\n$plan")
  }

  test("e7 attribution: one first and one last per purchase, linear " +
       "credit conserved within integer floor slack") {
    val rows = EventAnalytics.e7Attribution(spark, d).collect()
    val nFirst = rows.map(_.getAs[Long]("n_first")).sum
    val nLast = rows.map(_.getAs[Long]("n_last")).sum
    val nTouch = rows.map(_.getAs[Long]("n_touches")).sum
    val linear = rows.map(_.getAs[Long]("linear_micro")).sum
    assert(nFirst > 0, "no attributed purchase — fixture assumption broke")
    assert(nFirst === nLast,
      "every attributed purchase has exactly one first and one last touch")
    // per purchase, k touches earn k * (1e6 div k) micro-credits: at most
    // 1e6, short by at most k-1 — summed over P purchases the total sits
    // in [1e6*P - (T - P), 1e6*P]
    assert(linear <= 1000000L * nFirst, "linear credit over-attributed")
    assert(linear >= 1000000L * nFirst - (nTouch - nFirst),
      "linear credit leaked more than the integer-floor slack")
  }

  test("x63 dedup-recall audit: buckets in the threshold range, found " +
       "never exceeds truth, ppm arithmetic exact") {
    val rows = graft.queries.PipelineOps.x63DedupRecall(spark, d).collect()
    assert(rows.nonEmpty, "no truth pairs in the audited block")
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 4 && b <= 9, s"decile $b outside the J>=0.4 range")
      val t = r.getAs[Long]("n_truth"); val f = r.getAs[Long]("n_found")
      assert(f >= 0 && f <= t, "found pairs exceed ground truth")
      assert(r.getAs[Long]("recall_ppm") === f * 1000000L / t,
        "recall ppm drifted from exact integer arithmetic")
    }
  }

  test("x62 BPE pairs: 2-char pairs, descending counts, support bounds") {
    val rows = graft.queries.PipelineOps.x62BpePairCounts(spark, d).collect()
    assert(rows.length === 50)
    assert(rows.forall(_.getAs[String]("pair").length === 2))
    val counts = rows.map(_.getAs[Long]("n_occurrences"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "top-50 not count-descending")
    assert(rows.forall(r => r.getAs[Long]("n_words") >= 1 &&
      r.getAs[Long]("n_words") <= r.getAs[Long]("n_occurrences")),
      "distinct-word support outside [1, n_occurrences]")
  }

  test("x64 triangle count matches a driver-side exact recompute") {
    val row = graft.queries.GraphOps.x64TriangleCount(spark, d).collect()
    assert(row.length === 1)
    val (nE, nW, nT) = (row(0).getAs[Long]("n_edges"),
      row(0).getAs[Long]("n_wedges"), row(0).getAs[Long]("n_triangles"))
    assert(nE > 0 && nW >= nT && nT >= 0)
    // exact recompute: adjacency sets from the same co-purchase pairs;
    // each triangle has exactly 3 edges, so sum |N(a) ∩ N(b)| over
    // edges (a,b) counts every triangle exactly 3 times
    val op = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet
    assert(nE === edges.size.toLong, "edge count drifted")
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val tri3 = edges.iterator.map { case (a, b) => (adj(a) & adj(b)).size }.sum
    assert(tri3 % 3 === 0, "triangle-incidence sum not divisible by 3")
    assert(nT === tri3.toLong / 3, "triangle count drifted from exact")
  }

  test("x65 skip-gram co-occurrence matches a driver-side exact recompute") {
    val rows = graft.queries.PipelineOps.x65SkipgramCooc(spark, d).collect()
    assert(rows.length === 30)
    val w = rows.map(_.getAs[Long]("w_cooc"))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b },
      "top-30 not weight-descending")
    // exact recompute of the full (wa, wb) -> (count, weight) table
    val counts = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    Tables.documents(spark, d).select(col("text")).collect().foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      for (i <- toks.indices; dd <- 1 to 3 if i + dd < toks.length) {
        val k = (toks(i), toks(i + dd))
        val (c, ww) = counts.getOrElse(k, (0L, 0L))
        counts(k) = (c + 1, ww + (4 - dd))
      }
    }
    val expected = counts.iterator
      .filter(_._2._1 >= 5)
      .map { case ((wa, wb), (c, ww)) => (wa, wb, c, ww) }.toSeq
      .sortBy { case (wa, wb, _, ww) => (-ww, wa, wb) }.take(30)
    val got = rows.map(r => (r.getAs[String]("wa"), r.getAs[String]("wb"),
      r.getAs[Long]("n_cooc"), r.getAs[Long]("w_cooc"))).toSeq
    assert(got === expected, "top-30 drifted from exact recompute")
  }

  test("fe5 lift table: marginals tie out, lift arithmetic exact, cells " +
       "partition the events") {
    val rows = graft.queries.FeatureOps.fe5FeatureLift(spark, d).collect()
    val total = Tables.events(spark, d).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total,
      "cells do not partition the event stream")
    val byBucket = rows.groupBy(_.getAs[Long]("vbucket"))
    byBucket.foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n")).sum === g.head.getAs[Long]("rn"),
        "row marginal drifted from the cell sum")
    }
    rows.foreach { r =>
      val (n, rn, cn, nt) = (r.getAs[Long]("n"), r.getAs[Long]("rn"),
        r.getAs[Long]("cn"), total)
      assert(r.getAs[Long]("lift_ppm") === n * 1000000L * nt / (rn * cn),
        "lift ppm drifted from exact integer arithmetic")
    }
  }

  test("fe6 length buckets: doc totals conserved, waste ppm exact, " +
       "bucket boundary honored") {
    val rows = graft.queries.FeatureOps.fe6LengthBuckets(spark, d).collect()
    val docs = Tables.documents(spark, d).select(col("text")).collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    assert(rows.map(_.getAs[Long]("n_tok_sum")).sum === docs.sum)
    val corpusMax = rows.map(_.getAs[Long]("bucket") * 16).max
    rows.foreach { r =>
      val (b, nd, ts) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tok_sum"))
      assert(ts > nd * (b - 1) * 16, "tokens at or below the bucket floor")
      assert(ts <= nd * b * 16, "tokens exceed bucket capacity")
      assert(r.getAs[Long]("pad_waste_ppm") ===
        (nd * b * 16 - ts) * 1000000L / (nd * b * 16))
      assert(r.getAs[Long]("global_waste_ppm") ===
        (nd * corpusMax - ts) * 1000000L / (nd * corpusMax))
    }
  }

  test("x67 LPA communities match a driver-side synchronous recompute") {
    val rows = graft.queries.GraphOps.x67LpaCommunities(spark, d).collect()
    // recompute: same co-purchase edges, 3 synchronous mode-update rounds
    // with (count DESC, label ASC) tie-break
    val op = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = op.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys
      .toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nbrs = und.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    var lab: Map[Long, Long] = nbrs.keysIterator.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nbrs.map { case (node, ns) =>
        val hist = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        node -> hist.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expected = lab.values.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }.toSeq
      .sortBy { case (l, c) => (-c, l) }
    val got = rows.map(r =>
      (r.getAs[Long]("label"), r.getAs[Long]("n_members"))).toSeq
    assert(got === expected, "community histogram drifted from exact LPA")
  }

  test("dq9 freshness: watermark feed has zero lag, stale flag ties to lag") {
    val rows = graft.queries.QualityOps.dq9Freshness(spark, d).collect()
    assert(rows.nonEmpty)
    val lags = rows.map(_.getAs[Long]("lag_s"))
    assert(lags.min === 0L, "no feed sits at the watermark")
    assert(lags.forall(_ >= 0L), "negative lag")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_stale") === (r.getAs[Long]("lag_s") > 86400L),
        "staleness flag inconsistent with lag")
    }
  }

  test("e8 RFM segments match a driver-side exact quantile-disc recompute") {
    val rows = graft.queries.EventAnalytics.e8RfmSegments(spark, d).collect()
    val ev = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val users = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(_._2).max, xs.size.toLong, xs.map(_._3).sum)
    }.toSeq
    val wm = users.map(_._2).max
    val metrics = users.map { case (u, md, f, c) =>
      (u, java.time.temporal.ChronoUnit.DAYS.between(md, wm), f, c)
    }
    def scores(vals: Seq[Long]): Map[Long, Long] = {
      val dom = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val nt = vals.size.toLong
      var cum = 0L
      dom.map { case (v, c) =>
        cum += c; v -> ((cum * 5 + nt - 1) / nt)
      }.toMap
    }
    val (rs, fs, ms) = (scores(metrics.map(_._2)), scores(metrics.map(_._3)),
      scores(metrics.map(_._4)))
    val expected = metrics
      .map { case (_, r, f, c) => ((rs(r), 6 - fs(f), 6 - ms(c)), c) }
      .groupBy(_._1).map { case (k, xs) => (k, xs.size.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val got = rows.map(r => ((r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
      r.getAs[Long]("m_score")), r.getAs[Long]("n_users"),
      r.getAs[Long]("cents_total"))).toSeq
    assert(got === expected, "RFM cube drifted from exact quantile-disc")
  }

  test("u6 typed sessions match a driver-side exact recompute") {
    val rows = graft.queries.UserDefined.u6TypedSessions(spark, d).collect()
    val ev = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts)")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      val ts = xs.map(_._2).sorted
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      (u, ts.length.toLong, 1L + gaps.count(_ > 1800000000L),
        (if (gaps.isEmpty) 0L else gaps.max) / 1000000L)
    }.toSeq.sortBy(_._1)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq
    assert(got === expected, "typed session stats drifted from exact")
  }

  test("sql3 parameterized binding produces exactly q1a's rows") {
    val viaParam = SparkEntry.queries("sql3_param_text")(spark, d).collect()
    val viaApi = SparkEntry.queries("q1a_scan_filter")(spark, d).collect()
    assert(viaParam.length === viaApi.length && viaParam.length > 0)
    assert(viaParam.map(_.toSeq).toSeq === viaApi.map(_.toSeq).toSeq,
      "parameterized SQL drifted from the DataFrame form")
  }

  test("Observation piggybacks scan-side metrics on the action: no second pass") {
    // the 100 TB discipline for row-count audits: CollectMetricsExec
    // rides the production action instead of a second full scan
    val obs = org.apache.spark.sql.Observation("audit")
    val out = Tables.events(spark, d)
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents_seen"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect()
    val seen = obs.get
    assert(seen("rows_seen") === out.map(_.getAs[Long]("n")).sum,
      "observed row count drifted from the aggregated result")
    val cents = Tables.events(spark, d)
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).collect()(0).getLong(0)
    assert(seen("cents_seen") === cents,
      "observed checksum drifted from a direct aggregate")
  }

  test("sql2_q4_text produces exactly q4_wordcount's rows") {
    val viaText = SparkEntry.queries("sql2_q4_text")(spark, d).collect()
    val viaApi = SparkEntry.queries("q4_wordcount")(spark, d).collect()
    assert(viaText.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      viaApi.map(r => (r.getString(0), r.getLong(1))).toSeq,
      "SQL-text Q4 drifted from the DataFrame form")
  }

  test("x66 DSIR scores are bounded, length-normalized, and sorted") {
    val rows = graft.queries.PipelineOps.x66DsirImportance(spark, d).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tok")
      val sum = r.getAs[Long]("score_sum")
      val avg = r.getAs[Long]("score_avg_ppm")
      // target ⊆ raw ⇒ every per-token lr_ppm ≤ 10⁶
      assert(sum > 0 && sum <= nTok * 1000000L,
        s"doc ${r.getLong(0)}: score $sum outside (0, n_tok·10⁶]")
      assert(avg === sum / nTok, s"doc ${r.getLong(0)}: avg is not sum div n_tok")
    }
    val avgs = rows.map(_.getAs[Long]("score_avg_ppm"))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b },
      "top-20 not sorted by score_avg_ppm desc")
  }

  test("w8 resample grid is complete, contiguous, and count-preserving") {
    val rows = graft.queries.WindowOps.w8ResampleGrid(spark, d).collect()
    val byType = rows.groupBy(_.getString(0))
    val lo = rows.map(_.getAs[Long]("hr_ms")).min
    val hi = rows.map(_.getAs[Long]("hr_ms")).max
    val nHours = (hi - lo) / 3600000L + 1
    byType.foreach { case (t, rs) =>
      assert(rs.length.toLong === nHours, s"$t grid has holes or extras")
      val hrs = rs.map(_.getAs[Long]("hr_ms")).sorted
      assert(hrs.zip(hrs.tail).forall { case (a, b) => b - a == 3600000L },
        s"$t grid not hourly-contiguous")
      // LOCF: a gap row carries the previous row's fill unchanged
      val ordered = rs.sortBy(_.getAs[Long]("hr_ms"))
      ordered.zip(ordered.tail).foreach { case (prev, cur) =>
        if (cur.getAs[Long]("n_events") == 0L)
          assert(cur.getAs[Long]("vm_locf") === prev.getAs[Long]("vm_locf"),
            s"$t gap row at ${cur.getAs[Long]("hr_ms")} did not carry forward")
      }
    }
    val total = Tables.events(spark, d).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === total,
      "grid event counts do not preserve the input total")
  }

  test("fe7 covariance cells match a driver-side exact recompute") {
    val rows = graft.queries.FeatureOps.fe7Covariance(spark, d).collect()
    assert(rows.length === 36)
    val vecs = Tables.embeddings(spark, d)
      .select(expr("transform(slice(embedding, 1, 8), " +
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS LONG))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val expected = (for (i <- 0 until 8; j <- i until 8) yield {
      val n = vecs.length.toLong
      val si = vecs.map(_(i)).sum; val sj = vecs.map(_(j)).sum
      val sij = vecs.map(v => v(i) * v(j)).sum
      ((i + 1L, j + 1L), (n, si, sj, sij, n * sij - si * sj))
    }).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("i"), r.getAs[Long]("j"))
      val got = (r.getAs[Long]("n"), r.getAs[Long]("sum_i"),
        r.getAs[Long]("sum_j"), r.getAs[Long]("sum_ij"),
        r.getAs[Long]("cov_num"))
      assert(got === expected(k), s"cell $k drifted from exact")
      if (k._1 == k._2)
        assert(got._5 >= 0L, s"diagonal $k has negative variance numerator")
    }
  }

  test("e9 activity-streak histogram matches a driver-side exact recompute") {
    val rows = graft.queries.EventAnalytics.e9ActivityStreaks(spark, d).collect()
    val days = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val expected = days.groupBy(_._1).map { case (_, xs) =>
      val ds = xs.map(_._2).sorted
      // islands: consecutive days share a (day - index) anchor
      ds.zipWithIndex.map { case (day, i) => day - i }
        .groupBy(identity).map(_._2.size).max.toLong
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSeq.sorted
    val got = rows.map(r => (r.getAs[Long]("max_streak"),
      r.getAs[Long]("n_users"))).toSeq
    assert(got === expected, "streak histogram drifted from exact")
    assert(got.map(_._2).sum === days.map(_._1).distinct.length.toLong,
      "histogram does not cover every user exactly once")
  }

  test("j13 nearest match agrees with a driver-side exact recompute") {
    val rows = graft.queries.RelationalOps.j13NearestMatch(spark, d).collect()
    val ev = Tables.events(spark, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val expected = ev.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
      // mirror the window's (ts_us, event_id) total order exactly: a click
      // at the purchase's own µs counts as prev/next by event_id
      val clicks = byUser(u).filter(_._3 == "click")
      if (clicks.isEmpty) (id, None: Option[Long], "none")
      else {
        val back = clicks.filter(c => c._4 < ts || (c._4 == ts && c._1 < id))
          .map(ts - _._4).sorted.headOption
        val fwd = clicks.filter(c => c._4 > ts || (c._4 == ts && c._1 > id))
          .map(_._4 - ts).sorted.headOption
        (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (b <= f) (id, Some(b), "back") else (id, Some(f), "fwd")
          case (Some(b), None) => (id, Some(b), "back")
          case (None, Some(f)) => (id, Some(f), "fwd")
          case _ => (id, None, "none")
        }
      }
    }.sortBy(_._1)
    val got = rows.map(r => (r.getLong(0),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getString(4))).toSeq
    assert(got === expected.toSeq, "nearest-click table drifted from exact")
  }

  test("fe8 lag features step over the w8 grid exactly") {
    val grid = graft.queries.WindowOps.w8ResampleGrid(spark, d).collect()
      .map(r => ((r.getString(0), r.getAs[Long]("hr_ms")),
        (r.getAs[Long]("n_events"), r.getAs[Long]("vm_locf")))).toMap
    val rows = graft.queries.FeatureOps.fe8LagFeatures(spark, d).collect()
    assert(rows.length === grid.size, "fe8 dropped or invented grid rows")
    val H = 3600000L
    rows.foreach { r =>
      val t = r.getString(0); val hr = r.getAs[Long]("hr_ms")
      def lagv(k: Long): Option[Long] = grid.get((t, hr - k * H)).map(_._2)
      def opt(i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(opt(4) === lagv(1) || (r.isNullAt(4) && lagv(1).isEmpty))
      assert(opt(5) === lagv(2) || (r.isNullAt(5) && lagv(2).isEmpty))
      assert(opt(6) === lagv(24) || (r.isNullAt(6) && lagv(24).isEmpty))
      val nxt = grid.get((t, hr + H)).map(_._1)
      assert(opt(7) === nxt || (r.isNullAt(7) && nxt.isEmpty),
        s"$t@$hr target drifted")
    }
  }

  test("x68 also-bought similarity matches a driver-side exact recompute") {
    val rows = graft.queries.GraphOps.x68AlsoBought(spark, d).collect()
    val cp = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .join(Tables.orders(spark, d)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("c")), Seq("ok"))
      .select(col("c"), col("p")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val buyers = cp.groupBy(_._2).map { case (p, xs) => (p, xs.length.toLong) }
    val baskets = cp.groupBy(_._1).values.map(_.map(_._2).sorted)
      .filter(_.length <= 256)
    val common = scala.collection.mutable.Map[(Long, Long), Long]()
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        common((ps(i), ps(j))) = common.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val expected = common.iterator.filter(_._2 >= 3L).map { case ((v, w), cm) =>
      val (bv, bw) = (buyers(v), buyers(w))
      (v, w, cm, bv, bw, cm * 1000000L / (bv + bw - cm))
    }.toSeq.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected, "also-bought top-20 drifted from exact")
    got.foreach { case (_, _, cm, bv, bw, _) =>
      assert(cm <= math.min(bv, bw), "common buyers exceed a buyer set")
    }
  }

  test("e10 conversion-lag histogram matches a driver-side exact recompute") {
    val rows = graft.queries.EventAnalytics.e10ConversionLag(spark, d).collect()
    val ev = Tables.events(spark, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lags = ev.groupBy(_._1).flatMap { case (_, xs) =>
      val views = xs.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = xs.filter(t => t._2 == "purchase" && t._3 > fv).map(_._3 - fv)
        if (ps.isEmpty) None else Some(ps.min)
      }
    }.toSeq
    val expected = lags.groupBy(l => math.min(l / 3600000000L, 72L))
      .map { case (b, ls) => (b, ls.size.toLong, ls.map(_ / 1000000L).sum) }
      .toSeq.sortBy(_._1)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected, "conversion-lag histogram drifted from exact")
    assert(got.map(_._2).sum === lags.size.toLong)
  }

  test("dq10 Benford audit: digit domain, ppm closure, pinned expectations") {
    val rows = graft.queries.QualityOps.dq10Benford(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val digits = rows.map(_.getAs[Long]("digit"))
    assert(digits.forall(dg => dg >= 1 && dg <= 9), s"bad digits: ${digits.toSeq}")
    val total = Tables.events(spark, d)
      .filter(expr("CAST(round(value * 1000000) AS BIGINT) > 0")).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    // floor-division closure: Σ obs_ppm ∈ [10⁶ − #digits, 10⁶]
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum <= 1000000L && obsSum >= 1000000L - rows.length,
      s"obs ppm sum $obsSum outside floor-closure band")
    if (rows.length == 9)
      assert(rows.map(_.getAs[Long]("exp_ppm")).sum === 1000000L,
        "Benford expectation literals do not close to 10⁶ ppm")
    rows.foreach(r => assert(r.getAs[Long]("dev_ppm") ===
      r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")))
  }
}
