package graft

import graft.streaming.{Event, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Structured Streaming specs via MemoryStream: watermark late-data drop,
  * session merging, arbitrary keyed state, and the AvailableNow file
  * pipeline (which must agree with the batch twin on finalized windows).
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "click",
                 value: Double = 1.0): Event =
    Event(id, ts(minute), user, typ, value, "{}")

  test("tumbling stream: watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumble_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: events in hour 0; advance event time far past hour 0 + watermark
      mem.addData(ev(1, 10), ev(2, 20), ev(3, 30))
      q.processAllAvailable()
      mem.addData(ev(4, 200)) // 03:20 — watermark moves to 03:10
      q.processAllAvailable()
      // hour-0 window is finalized and emitted; a late hour-0 row must be dropped
      mem.addData(ev(5, 15))
      q.processAllAvailable()
      val out = spark.table("tumble_test")
        .filter(col("win_start") === lit(ts(0)))
        .agg(sum("cnt")).head()
      assert(out.getLong(0) === 3L, "late event must not re-open the closed window")
    } finally q.stop()
  }

  test("session stream merges events within the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionCounts(mem.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at 0,20,40 min (one session), then 120 (new session)
      mem.addData(ev(1, 0), ev(2, 20), ev(3, 40), ev(4, 120))
      // push watermark forward so sessions finalize
      mem.addData(ev(9, 600, user = 99L))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .filter(col("user_id") === 1L)
        .orderBy("sess_start").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n_events") === 3L)
      assert(rows(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("dedupStream removes duplicate event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, 0), ev(1, 0), ev(2, 5), ev(1, 1))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 2L)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.runningUserTotals(mem.toDS())
      .toDF("user_id", "n", "total")
      .writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(ev(1, 0, user = 7, value = 2.0), ev(2, 1, user = 7, value = 3.0))
      q.processAllAvailable()
      mem.addData(ev(3, 2, user = 7, value = 5.0))
      q.processAllAvailable()
      val last = spark.table("state_test")
        .filter(col("user_id") === 7L)
        .orderBy(col("n").desc).head()
      assert(last.getLong(1) === 3L)
      assert(math.abs(last.getDouble(2) - 10.0) < 1e-12)
    } finally q.stop()
  }

  test("transformWithState (Spark 4 API) keeps running counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = Streams.runningCountsTws(mem.toDS())
      .toDF("user_id", "n")
      .writeStream.format("memory").queryName("tws_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(ev(1, 0, user = 9), ev(2, 1, user = 9), ev(3, 1, user = 4))
      q.processAllAvailable()
      mem.addData(ev(4, 2, user = 9))
      q.processAllAvailable()
      val out = spark.table("tws_test")
      assert(out.filter(col("user_id") === 9L).agg(max("n")).head().getLong(0) === 3L)
      assert(out.filter(col("user_id") === 4L).agg(max("n")).head().getLong(0) === 1L)
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // multi-state transformWithState (3 column families) requires RocksDB
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming funnel finalizes exact e1 stages when the watermark passes") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.funnelStream(mem.toDS())
      .toDF("user_id", "reached_stage", "first_view_us")
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // A: view@10 → click@20 → purchase@40  = stage 3
      // B: view@10, click@50 (40 min > 30 window)  = stage 1
      // C: view@10 → click@30, purchase@90 (> click+30)  = stage 2
      // E: click@5 with no view EVER — must produce no row at all
      mem.addData(
        ev(1, 10, user = 10, typ = "view"), ev(2, 20, user = 10, typ = "click"),
        ev(3, 40, user = 10, typ = "purchase"),
        ev(4, 10, user = 20, typ = "view"),
        ev(6, 10, user = 30, typ = "view"), ev(7, 30, user = 30, typ = "click"),
        ev(9, 5, user = 40, typ = "click"))
      q.processAllAvailable()
      // watermark is minute 40 < every first_view + 60: nothing final yet
      assert(spark.table("funnel_test").isEmpty,
        "no verdict may emit before first_view + 60 min is watermark-final")
      // late-but-in-envelope stragglers, then the watermark passes min 70
      mem.addData(ev(5, 50, user = 20, typ = "click"),
        ev(8, 90, user = 30, typ = "purchase"))
      q.processAllAvailable()
      mem.addData(ev(21, 300, user = 99, typ = "view")) // nudge: timers fire
      q.processAllAvailable()
      val out = spark.table("funnel_test")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out.get(10L).map(_._1) === Some(3L))
      assert(out.get(20L).map(_._1) === Some(1L))
      assert(out.get(30L).map(_._1) === Some(2L))
      assert(!out.contains(40L), "a user with no view has no funnel verdict")
      out.collect { case (u, (_, v)) if u != 99L =>
        assert(v === ts(10).getTime * 1000L, s"user $u anchored off minute 10")
      }
    } finally q.stop()
  }}

  test("streaming funnel buffers cross-type disorder: click row before its view row") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // 2h lateness so the view arriving after its click is inside the
    // allowed-lateness envelope, not dropped as a late row
    val q = Streams.funnelStream(mem.toDS(), lateness = "2 hours")
      .toDF("user_id", "reached_stage", "first_view_us")
      .writeStream.format("memory").queryName("funnel_disorder_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, 20, user = 50, typ = "click")) // arrives first
      q.processAllAvailable()
      mem.addData(ev(2, 10, user = 50, typ = "view"))  // its anchor, later
      q.processAllAvailable()
      mem.addData(ev(3, 600, user = 99, typ = "view")) // watermark → min 480
      q.processAllAvailable()
      mem.addData(ev(4, 605, user = 99, typ = "view"))
      q.processAllAvailable()
      val out = spark.table("funnel_disorder_test")
        .filter(col("user_id") === 50L).collect()
      assert(out.length === 1)
      assert(out.head.getLong(1) === 2L,
        "the pre-anchor click must be credited once its view arrives")
    } finally q.stop()
  }}

  test("streaming CEP finalizes exact e11 user-day pattern counts") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the REAL sf0.001 events table through the pattern machine, compared
    // row-for-row against the declared batch key — not a synthetic fixture
    val evs = graft.Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Event].collect()
    val mem = MemoryStream[Event]
    val q = Streams.cepPatternStream(mem.toDS())
      .toDF("user_id", "day", "n_events", "n_vcp")
      .writeStream.format("memory").queryName("cep_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(evs.toIndexedSeq: _*)
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past every
      // real day-end, the second triggers with that watermark so all
      // buffered day timers provably fire
      val lastMs = evs.map(_.ts.getTime).max
      mem.addData(Event(999999L, new java.sql.Timestamp(lastMs + 3L * 86400000L),
        999999L, "view", 0.0, ""))
      q.processAllAvailable()
      mem.addData(Event(999998L, new java.sql.Timestamp(lastMs + 4L * 86400000L),
        999998L, "view", 0.0, ""))
      q.processAllAvailable()
      val got = spark.table("cep_test")
        .filter(col("user_id") < 999000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val want = graft.queries.EventAnalytics
        .e11CepPattern(spark, TestSpark.sf0001)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(want.exists(_._2._2 > 0L),
        "fixture has no vcp matches — the parity assert would be vacuous")
      assert(got === want,
        s"stream/batch CEP mismatch: ${got.toSet.diff(want.toSet).take(5)} vs " +
          s"${want.toSet.diff(got.toSet).take(5)}")
    } finally q.stop()
  }}

  test("flatMapGroupsWithState emits the threshold alert exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.thresholdAlerts(mem.toDS(), threshold = 10.0)
      .toDF("user_id", "total")
      .writeStream.format("memory").queryName("alert_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, 0, user = 5, value = 4.0), ev(2, 1, user = 5, value = 3.0))
      q.processAllAvailable()
      assert(spark.table("alert_test").count() === 0L) // 7.0 < 10
      mem.addData(ev(3, 2, user = 5, value = 5.0)) // crosses at 12.0
      q.processAllAvailable()
      mem.addData(ev(4, 3, user = 5, value = 9.0)) // already crossed: no new alert
      q.processAllAvailable()
      val alerts = spark.table("alert_test").collect()
      assert(alerts.length === 1)
      assert(alerts(0).getLong(0) === 5L)
      assert(math.abs(alerts(0).getDouble(1) - 12.0) < 1e-12)
    } finally q.stop()
  }

  test("streaming document dedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.dedupDocuments(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"))
      .writeStream.format("memory").queryName("docdedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, "alpha beta", ts(0)), (2L, "alpha beta", ts(1)),
                  (3L, "gamma", ts(2)))
      q.processAllAvailable()
      mem.addData((4L, "alpha beta", ts(3))) // still duplicate content
      q.processAllAvailable()
      val kept = spark.table("docdedup_test").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L))
    } finally q.stop()
  }

  test("event-time timers close quiet sessions when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = Streams.inactivityAlerts(mem.toDS(), gapMs = 30L * 60 * 1000)
      .toDF("user_id", "last_seen_ms", "n_events")
      .writeStream.format("memory").queryName("inactivity_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 active at minutes 0..10, then silent
      mem.addData(ev(1, 0), ev(2, 5), ev(3, 10))
      q.processAllAvailable()
      assert(spark.table("inactivity_test").isEmpty,
        "no alert may fire before the watermark passes last+gap")
      // user 2's event at minute 120 pushes the watermark past 10+30
      mem.addData(ev(4, 120, user = 2L))
      q.processAllAvailable()
      mem.addData(ev(5, 125, user = 2L)) // nudge a batch so timers evaluate
      q.processAllAvailable()
      val alerts = spark.table("inactivity_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(alerts.toSeq === Seq((1L, ts(10).getTime, 3L)),
        s"exactly one alert for user 1 at its last-seen time; got ${alerts.toSeq}")
      // user 1's state is cleared: a new event restarts the count at 1
      mem.addData(ev(6, 126))
      q.processAllAvailable()
      mem.addData(ev(7, 300, user = 2L)) // push watermark past 126+30
      q.processAllAvailable()
      mem.addData(ev(8, 305, user = 2L))
      q.processAllAvailable()
      val second = spark.table("inactivity_test")
        .filter(col("user_id") === 1L && col("n_events") === 1L)
      assert(second.count() === 1L,
        "post-alert state must restart from zero (alert cleared it)")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming LOCF carries the last observation across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = Streams.locfStream(mem.toDS())
      .toDF("user_id", "event_id", "ts_us", "filled")
      .writeStream.format("memory").queryName("locf_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: obs at id 7 (value 2.0), gaps at 8, 9; batch break; gap 10,
      // obs 14 (value 5.0), gap 15. user 2: gaps only -> head nulls.
      mem.addData(ev(7, 0, value = 2.0), ev(8, 1, value = 9.9),
                  ev(9, 2, value = 9.9), ev(1, 0, user = 2L))
      q.processAllAvailable()
      mem.addData(ev(10, 3, value = 9.9), ev(14, 4, value = 5.0),
                  ev(15, 5, value = 9.9))
      q.processAllAvailable()
      val rows = spark.table("locf_test")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      // batch-parity oracle: w6's fill semantics on the same 7 rows
      assert(rows((1L, 7L))  === Some(2.0), "observation emits itself")
      assert(rows((1L, 8L))  === Some(2.0), "gap carries within the batch")
      assert(rows((1L, 9L))  === Some(2.0))
      assert(rows((1L, 10L)) === Some(2.0), "carry survives the batch break")
      assert(rows((1L, 14L)) === Some(5.0), "new observation replaces the carry")
      assert(rows((1L, 15L)) === Some(5.0))
      assert(rows((2L, 1L))  === None, "head rows before any observation stay null")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming perceptual-hash dedup keeps the first image per fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val same = "the quick brown fox jumps over the lazy dog"
    val other = "zzzz 0000 zzzz 0000 zzzz 0000 completely different raster"
    // precondition via the batch hasher: the two texts must land on
    // different fingerprints, else the assertion below tests nothing
    val batch = graft.multimodal.Media.perceptualHashes(
        Seq((1L, same.getBytes("UTF-8")), (3L, other.getBytes("UTF-8"))).toDS())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batch(1L) != batch(3L), "test texts collided on one dHash; pick others")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.phashDedupStream(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"))
      .writeStream.format("memory").queryName("phash_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, same, ts(0)), (2L, same, ts(1)), (3L, other, ts(2)))
      q.processAllAvailable()
      val rows = spark.table("phash_test")
        .select("doc_id", "ph_hi", "ph_lo")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows.keySet === Set(1L, 3L),
        "same-fingerprint duplicate must drop, different raster must survive")
      // streamed fingerprints are bit-identical to the batch hasher's
      assert(rows === batch)
    } finally q.stop()
  }

  test("streaming passage dedup keeps only the first copy of shared boilerplate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val common = (1 to 20).map(i => s"w$i").mkString(" ")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.dedupPassages(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"))
      .writeStream.format("memory").queryName("passdedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, s"$common a b c", ts(0)))
      q.processAllAvailable()
      // doc 2 shares the 20-token boilerplate passage, differs in its tail
      mem.addData((2L, s"$common x y z", ts(1)))
      q.processAllAvailable()
      val kept = spark.table("passdedup_test")
        .select("doc_id", "passage_idx")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(kept === Set((1L, 0), (1L, 1), (2L, 1)))
    } finally q.stop()
  }

  test("streaming constraint monitor counts violations per finalized window, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.constraintMonitorStream(mem.toDF())
      .writeStream.format("memory").queryName("dqmon_test")
      .outputMode(OutputMode.Append()).start()
    val batch1 = Seq(
      ev(1, 10), ev(2, 20, value = 5000.0),          // value out of range
      ev(3, 30, typ = "bogus"), ev(4, 40))           // type outside the enum
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(ev(9, 200)) // 03:20 — watermark passes hour 0, finalizing it
      q.processAllAvailable()
      val row = spark.table("dqmon_test")
        .filter(col("win_start") === lit(ts(0))).head()
      assert(row.getAs[Long]("n_checked") === 4L)
      assert(row.getAs[Long]("v_value_range") === 1L)
      assert(row.getAs[Long]("v_type_enum") === 1L)
      // a late hour-0 violation must not re-open the finalized window
      mem.addData(ev(5, 15, value = -9999.0))
      q.processAllAvailable()
      assert(spark.table("dqmon_test")
        .filter(col("win_start") === lit(ts(0))).count() === 1L)
      // parity: the finalized window equals the batch rule evaluation
      val b = batch1.toDF()
        .groupBy(window(col("ts"), "1 hour")).agg(
          count(lit(1)).as("n_checked"),
          count(when(col("value") < -1000 || col("value") > 1000, 1))
            .as("v_value_range"),
          count(when(!col("event_type").isin(
            "click", "view", "purchase", "signup", "error"), 1))
            .as("v_type_enum")).head()
      assert(row.getAs[Long]("n_checked") === b.getAs[Long]("n_checked"))
      assert(row.getAs[Long]("v_value_range") === b.getAs[Long]("v_value_range"))
      assert(row.getAs[Long]("v_type_enum") === b.getAs[Long]("v_type_enum"))
    } finally q.stop()
  }

  test("streaming hash sample equals the batch filter over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = Streams.sampleDocuments(mem.toDF().withColumnRenamed("value", "doc_id"))
      .writeStream.format("memory").queryName("sample_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(0L until 200L: _*)
      q.processAllAvailable()
      val streamed = spark.table("sample_test")
        .select("doc_id").as[Long].collect().sorted
      val batch = Streams.sampleDocuments((0L until 200L).toDF("doc_id"))
        .select("doc_id").as[Long].collect().sorted
      assert(streamed.nonEmpty && streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streaming winnow profile is bit-identical to the batch x79 profile") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real corpus text through a memory stream in TWO micro-batches: the
    // selection is stateless per document, so batch boundaries must not
    // change a single row vs the batch x79 key over the same docs
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").limit(100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.winnowProfileStream(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("winnow_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.take(50).toSeq: _*)
      q.processAllAvailable()
      mem.addData(docs.drop(50).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("winnow_test")
        .collect().map(_.toString).sorted
      val ids = docs.map(_._1).toSet
      val batch = SparkEntry.queries("x79_winnow_fingerprint")(
          spark, TestSpark.sf0001)
        .filter(col("doc_id").isin(ids.toSeq: _*))
        .collect().map(_.toString).sorted
      assert(batch.nonEmpty && streamed.sameElements(batch),
        s"stream/batch divergence: ${streamed.length} vs ${batch.length} rows")
    } finally q.stop()
  }

  test("streaming winnow pairs twin emits exactly batch x79b's verified pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus = real docs + mid-text-edited twins: winnow selection is
    // content-anchored, so each twin pair must survive blocking AND the
    // exact-Jaccard verify — a nonempty parity target
    val base = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val twins = base.take(20).map { case (id, t) =>
      val w = t.split(" ")
      (id + 1000000L, w.updated(w.length / 2, "zqxedit").mkString(" "))
    }
    val corpusDf = (base ++ twins).toSeq.toDF("doc_id", "text")
    val batch = graft.queries.PipelineOps
      .winnowPairsOver(spark, corpusDf)
      .collect().map(_.toString).sorted
    assert(batch.length >= 10, s"parity target too small: ${batch.length}")
    // the published at-rest index pair (df-capped fingerprints = x79b's
    // own candidate-stage table; per-doc sorted shingle sets)
    val (fpIdx, shIdx) = Streams.publishWinnowIndex(corpusDf)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.winnowPairsStream(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"), fpIdx, shIdx)
      .writeStream.format("memory").queryName("winnowpairs_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // two micro-batches splitting MID-corpus: every pair still surfaces
      // (each unordered pair is found from whichever side arrives, and
      // double-finds collapse in the watermarked pair-dedup)
      val rows = (base ++ twins).map { case (id, t) => (id, t, ts(0)) }
      mem.addData(rows.take(30).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(30).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("winnowpairs_test")
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(batch),
        s"stream/batch divergence: ${streamed.length} vs ${batch.length} pairs")
    } finally q.stop()
  }

  test("streaming decontamination flags exactly the batch x20 train docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val static = Streams.testSetShingles(docs)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.decontamStream(mem.toDF().toDF("doc_id", "text"), static)
      .writeStream.format("memory").queryName("decontam_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val train = docs.filter(col("doc_id") % 97 =!= 0).as[(Long, String)].collect()
      // two micro-batches: the stream-static join must be batch-boundary-blind
      mem.addData(train.take(train.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(train.drop(train.length / 2).toSeq: _*)
      q.processAllAvailable()
      val flagged = spark.table("decontam_test").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batch = SparkEntry.queries("x20_decontam")(spark, TestSpark.sf0001)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(flagged === batch)
    } finally q.stop()
  }

  test("streaming CMS sketch is byte-identical to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streams.cmsHeavyHittersStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      // three micro-batches: the constant-size sketch state must fold
      // them identically to one batch pass
      docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
        mem.addData(g.toSeq: _*); q.processAllAvailable()
      }
      val streamedSk = spark.table("cms_test")
        .head().getAs[Array[Byte]]("sk")
      val batchSk = Streams.cmsHeavyHittersStream(docs.toSeq.toDF("doc_id", "text"))
        .head().getAs[Array[Byte]]("sk")
      assert(java.util.Arrays.equals(streamedSk, batchSk),
        "streamed CMS bytes diverge from the batch sketch")
      // and the probe side agrees with exact counts on the top token
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(streamedSk))
      val top = SparkEntry.queries("x51_heavy_hitters")(spark, TestSpark.sf0001)
        .head()
      val est = cms.estimateCount(top.getAs[String]("tok")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est >= top.getAs[Long]("n_exact"),
        "CMS under-counted — one-sided error contract broken")
    } finally q.stop()
  }

  test("streaming incremental dedup flags exactly the batch x39 index hits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // publish the index (and get the batch ground truth) via the declared key
    val decisions = SparkEntry.queries("x39_incremental_dedup")(spark, TestSpark.sf0001)
      .select("doc_id", "n_base_dups").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val index = spark.read.schema("doc_id LONG, sh LONG")
      .parquet(graft.queries.PipelineOps.x39IndexPath(spark, TestSpark.sf0001))
    // the same synthesized "new crawl" x39 scores, fed as a stream in two
    // micro-batches (the stream-static join must be batch-boundary-blind)
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val batchDocs = docs.filter(col("doc_id") % 5 === 0)
      .unionByName(base.filter(col("doc_id") % 7 === 4)
        .select((col("doc_id") + 40000000L).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      .as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streams.incrementalDedupStream(mem.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("incdedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batchDocs.take(batchDocs.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(batchDocs.drop(batchDocs.length / 2).toSeq: _*)
      q.processAllAvailable()
      // k band collisions emit k rows; distinct pairs are the decision unit
      val streamed = spark.table("incdedup_test")
        .select("doc_id", "dup_of").distinct()
        .groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every doc's distinct index-hit count must equal batch n_base_dups —
      // this also pins the per-row HOF simhash to the batch aggregation
      // formulation bit-for-bit (any drifted bit shifts some hamming)
      assert(streamed.nonEmpty)
      decisions.foreach { case (id, nBase) =>
        assert(streamed.getOrElse(id, 0L) === nBase,
          s"doc $id: stream saw ${streamed.getOrElse(id, 0L)} index dups, batch saw $nBase")
      }
      assert(streamed.keySet.subsetOf(decisions.keySet))
    } finally q.stop()
  }

  test("streaming quality filter keeps exactly the batch x29 keep set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = Streams.qualityFilterStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("quality_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.as[(Long, String)].collect()
      // two micro-batches: the stateless filter must be batch-boundary-blind
      mem.addData(rows.take(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("quality_test").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batch = SparkEntry.queries("x29_quality_classifier")(spark, TestSpark.sf0001)
        .filter(col("keep") === 1).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming selector scoring equals batch x81b decisions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text", "lang", "n_chars")
    // train at rest on the full corpus, then MATERIALIZE the model row
    // before serving it to the stream (a live training plan would re-run
    // the training aggregate inside every micro-batch — see the scaladoc)
    val m = graft.queries.PipelineOps.x81TrainOver(spark, docs)
      .select("w_bias", "w_ttr", "w_stop", "w_len", "w_wlen", "threshold")
      .collect()(0)
    val model = Seq((m.getLong(0), m.getLong(1), m.getLong(2),
        m.getLong(3), m.getLong(4), m.getLong(5)))
      .toDF("w_bias", "w_ttr", "w_stop", "w_len", "w_wlen", "threshold")
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = Streams.selectorScoreStream(
        mem.toDF().toDF("doc_id", "text", "lang", "n_chars"), model)
      .writeStream.format("memory").queryName("selector_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.as[(Long, String, String, Long)].collect()
      // two micro-batches: stateless scoring must be batch-boundary-blind
      mem.addData(rows.take(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val streamed = spark.table("selector_test")
        .select("doc_id", "y", "score", "keep", "correct")
        .collect().map(key).toSet
      val batch = graft.queries.PipelineOps.x81bScoreOver(spark, docs)
        .select("doc_id", "y", "score", "keep", "correct")
        .collect().map(key).toSet
      assert(streamed === batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming chunker emits exactly the batch x35 chunks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = Streams.chunkStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.as[(Long, String)].collect()
      mem.addData(rows.take(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("chunk_test")
        .select("doc_id", "chunk_id", "n_tok", "chunk_hash")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = SparkEntry.queries("x35_chunking")(spark, TestSpark.sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming url dedup drops re-crawled variants of the same canonical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = Streams.urlDedupStream(mem.toDF().toDF("url", "ingest_ts"))
      .writeStream.format("memory").queryName("urldedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      mem.addData(
        ("HTTPS://a.Example.COM:443/p/1?utm_source=m", t0),
        ("https://a.example.com/p/1/", t0),
        ("https://a.example.com/p/1#frag", t0),
        ("https://b.example.com/p/2", t0))
      q.processAllAvailable()
      val kept = spark.table("urldedup_test").select("canonical")
        .collect().map(_.getString(0)).sorted
      assert(kept.toSeq === Seq(
        "https://a.example.com/p/1", "https://b.example.com/p/2"))
    } finally q.stop()
  }

  test("streaming mixture sample matches batch x24 membership across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.StringPolyHash.register(spark)
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "lang")
    val rates = graft.queries.CorpusOps.mixtureRates(
      Tables.documents(spark, TestSpark.sf0001))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.mixtureSampleStream(mem.toDF().toDF("doc_id", "lang"), rates)
      .writeStream.format("memory").queryName("mixture_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val all = docs.as[(Long, String)].collect()
      // two micro-batches: membership must be batch-boundary-blind
      mem.addData(all.take(all.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(all.drop(all.length / 2).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("mixture_test").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // batch membership replayed directly: same rate table, same hash
      val batch = docs.join(broadcast(rates), "lang")
        .filter(pmod(expr("graft_polyhash(cast(doc_id as string))"), lit(10000))
          < col("rate_pm"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty && streamed.size < all.length)
    } finally q.stop()
  }

  test("streaming LM scorer re-aggregates to exactly the batch x42 likelihoods") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the model is trained OFFLINE (batch lmModel over the reference slice);
    // the stream only consumes it as static lookup tables
    val (uni, bi) = graft.queries.PipelineOps.lmModel(spark, TestSpark.sf0001)
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = Streams.lmScoreStream(mem.toDF().toDF("doc_id", "text"), uni, bi)
      .writeStream.format("memory").queryName("lmscore_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.as[(Long, String)].collect()
      // two micro-batches: the stateless scorer must be batch-boundary-blind
      mem.addData(rows.take(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toSeq: _*)
      q.processAllAvailable()
      // sink-side per-doc fold — the declared contract — must be
      // bit-identical to batch x42 (integer micro-units: no float order)
      val streamed = spark.table("lmscore_test")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("p_micro").as("ll_micro_sum"))
        .withColumn("ll_micro_mean", expr("ll_micro_sum div n_bigrams"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val batch = SparkEntry.queries("x42_lm_score")(spark, TestSpark.sf0001)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(streamed === batch && streamed.nonEmpty)
      // reference-slice docs exist in the scored set (the model's own
      // training rows score too — CCNet scores everything, then thresholds)
      assert(streamed.keys.exists(_ % 10 == 0))
    } finally q.stop()
  }

  test("streaming embedding dedup marks same-bucket duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val b = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val mem = MemoryStream[graft.streaming.VecIn]
    val q = Streams.dedupEmbeddings(mem.toDF(), threshold = 0.999)
      .writeStream.format("memory").queryName("embdedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two originals + one exact dup of a (cosine 1.0, same bucket)
      mem.addData(graft.streaming.VecIn(0L, a), graft.streaming.VecIn(1L, b),
        graft.streaming.VecIn(2L, a))
      q.processAllAvailable()
      // batch 2: dup of b — state must survive the batch boundary
      mem.addData(graft.streaming.VecIn(3L, b))
      q.processAllAvailable()
      val rows = spark.table("embdedup_test")
        .orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.toSeq === Seq(
        (0L, -1L, false), (1L, -1L, false), (2L, 0L, true), (3L, 1L, true)))
    } finally q.stop()
  }

  test("streaming corpus refresh applies insert/update/delete batches like batch MERGE") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_refresh_").toFile.getPath
    val mem = MemoryStream[(Long, String, String)]
    val q = Streams.corpusRefreshStream(
      mem.toDF().toDF("doc_id", "new_text", "op"), root)
    try {
      // batch 1: three inserts
      mem.addData((1L, "alpha", "I"), (2L, "beta", "I"), (3L, "gamma", "I"))
      q.processAllAvailable()
      // batch 2: update 1, delete 2, insert 4
      mem.addData((1L, "alpha v2", "U"), (2L, null, "D"), (4L, "delta", "I"))
      q.processAllAvailable()
      val latest = new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .sortBy(_.getName.drop(1).toLong).last
      val state = spark.read.parquet(latest.getPath)
        .as[(Long, String)].collect().sortBy(_._1)
      assert(state.toSeq === Seq((1L, "alpha v2"), (3L, "gamma"), (4L, "delta")))
      // prior version untouched (snapshot isolation for concurrent readers)
      val v0 = spark.read.parquet(s"$root/v0").as[(Long, String)]
        .collect().sortBy(_._1)
      assert(v0.toSeq === Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    } finally q.stop()
  }

  test("stream-stream join matches clicks to purchases within the hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.clickToPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(ev(1, 0, user = 1, typ = "click"),
                     ev(2, 10, user = 2, typ = "click"))
      purchases.addData(
        ev(101, 30, user = 1, typ = "purchase"),   // within 1h of click 1 ✓
        ev(102, 200, user = 2, typ = "purchase"),  // 3h10m after click 2 ✗
        ev(103, 40, user = 3, typ = "purchase"))   // no click ✗
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test")
        .select("click_id", "purchase_id").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 101L)))
    } finally q.stop()
  }

  test("AvailableNow file pipeline processes the events table and stops") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // file stream sources take a directory, not a single file — stage it
    val src = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      src.resolve("events.parquet"))
    val n = Streams.runAvailableNow(spark, src.toString, out)
    // Append mode only emits windows finalized by the watermark; the last
    // hour(s) stay open — so strictly fewer rows than the batch twin, but
    // the finalized prefix must match it exactly.
    val emitted = spark.read.parquet(s"$out/agg")
    val batch = SparkEntry.queries("s1_tumble")(spark, TestSpark.sf0001)
    val emittedKeyed = emitted.select(unix_millis(col("win_start")).as("win_start_ms"),
      col("event_type"), col("cnt"), col("sum_value"))
    val diff = emittedKeyed.except(batch)
    assert(n > 0)
    assert(diff.count() === 0L, "every finalized streaming window must match the batch twin")
  }

  test("streaming session sequences: finalized digests equal the batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftSession.attach(spark)
    val mem = MemoryStream[Event]
    val q = Streams.sessionSequenceStream(mem.toDF())
      .writeStream.format("memory").queryName("seq_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two sessions (gap 40 min); user 2: one session — events
      // arrive out of order within a session to exercise the digest sort
      val evs = Seq(
        ev(2, 5, user = 1, typ = "view"), ev(1, 0, user = 1, typ = "click"),
        ev(3, 60, user = 1, typ = "purchase"),
        ev(10, 3, user = 2, typ = "signup"), ev(11, 8, user = 2, typ = "click"))
      mem.addData(evs: _*)
      q.processAllAvailable()
      // push the watermark far forward so every session above finalizes
      mem.addData(ev(99, 600, user = 9))
      q.processAllAvailable()
      val got = spark.table("seq_test")
        .select(col("user_id"), col("sess_start_us"), col("n_events"), col("seq_hash"))
        .as[(Long, Long, Long, Long)].collect().toSet
      // batch replay: the same function over the same rows (session_window
      // works identically in batch; no watermark dropping applies)
      val batch = Streams.sessionSequenceStream(evs.toDS().toDF())
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === batch, s"streamed sessions $got != batch $batch")
      // structure: user 1 split into two sessions, the first with the
      // out-of-order pair digested in event-time order
      assert(got.size === 3)
      val u1first = got.find(r => r._1 == 1L && r._3 == 2L).get
      val expected = {
        val s = "click view"
        s.getBytes("UTF-8").toSeq match {
          case h +: t => t.foldLeft(h & 0xffL)((a, b) => (a * 31 + (b & 0xffL)) % 1000003L)
        }
      }
      assert(u1first._4 === expected, "digest must follow event-time order, not arrival order")
    } finally q.stop()
  }

  test("stream-stream interval join: in-window pairs only, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val acts = MemoryStream[Event]
    val q = Streams.intervalJoinStream(views.toDF(), acts.toDF())
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // view at :10 for users 1 and 2; acts at :20 (in window), :50 (out:
      // 40 min later), and user-3 act with no view at all
      views.addData(ev(100, 10, user = 1), ev(101, 10, user = 2))
      acts.addData(ev(200, 20, user = 1), ev(201, 50, user = 1),
        ev(202, 25, user = 3))
      q.processAllAvailable()
      val got = spark.table("ssj_test")
        .select(col("view_id"), col("act_id")).as[(Long, Long)].collect().toSet
      assert(got === Set((100L, 200L)),
        s"only the in-interval same-user pair may join, got $got")
      // batch parity: the identical join expression over the same rows
      val vb = Seq(ev(100, 10, user = 1), ev(101, 10, user = 2)).toDS().toDF()
      val ab = Seq(ev(200, 20, user = 1), ev(201, 50, user = 1),
        ev(202, 25, user = 3)).toDS().toDF()
      val batch = Streams.intervalJoinStream(vb, ab)
        .select(col("view_id"), col("act_id")).as[(Long, Long)].collect().toSet
      assert(batch === got, "streamed pairs must equal the batch replay")
    } finally q.stop()
  }

  test("stream-stream left-outer join emits unmatched views after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val acts = MemoryStream[Event]
    val q = Streams.intervalJoinStream(views.toDF(), acts.toDF(), "leftOuter")
      .writeStream.format("memory").queryName("ssj_outer_test")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(ev(100, 10, user = 1), ev(101, 10, user = 2))
      acts.addData(ev(200, 20, user = 1))
      q.processAllAvailable()
      // user-2's view is unmatched but its interval (until :40 + 10min wm)
      // has not expired — it must NOT have been emitted as a null row yet
      val early = spark.table("ssj_outer_test")
      assert(early.filter(col("view_id") === 101L).count() === 0L,
        "outer row emitted before the watermark proved no match can come")
      // advance BOTH watermarks far past view_ts + 30min + 10min
      views.addData(ev(110, 300, user = 9))
      acts.addData(ev(210, 300, user = 9))
      q.processAllAvailable()
      views.addData(ev(111, 310, user = 9))
      acts.addData(ev(211, 310, user = 9))
      q.processAllAvailable()
      val out = spark.table("ssj_outer_test")
        .filter(col("view_id") === 101L).collect()
      assert(out.length === 1 && out(0).isNullAt(out(0).fieldIndex("act_id")),
        "expired unmatched view must surface exactly once with null act columns")
    } finally q.stop()
  }

  test("state-store provider parity: HDFS-backed and RocksDB agree on " +
       "sessionization and keyed running state") {
    // The transformWithState suites above REQUIRE RocksDB; everything else
    // in this spec pins semantics on the default HDFSBackedStateStore.
    // At 100 TB the state backend is RocksDB (bounded executor heap,
    // incremental checkpoints), so this test re-runs two representative
    // stateful pipelines — watermarked session windows and
    // mapGroupsWithState running totals — under BOTH providers and
    // asserts the finalized outputs are identical: provider choice is an
    // ops decision, never a semantics one.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    def runOnce(provider: String, tag: String)
        : (Array[(Long, Long)], Array[(Long, Long, Double)]) = {
      val prev = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey, provider)
      try {
        val sess = MemoryStream[Event]
        val sq = Streams.sessionCounts(sess.toDF())
          .writeStream.format("memory").queryName(s"prov_sess_$tag")
          .outputMode(OutputMode.Append()).start()
        try {
          sess.addData(ev(1, 0), ev(2, 20), ev(3, 40), ev(4, 120),
            ev(5, 10, user = 2), ev(6, 55, user = 2))
          sess.addData(ev(9, 600, user = 99))
          sq.processAllAvailable()
        } finally sq.stop()
        val st = MemoryStream[Event]
        val tq = Streams.runningUserTotals(st.toDS())
          .toDF("user_id", "n", "total")
          .writeStream.format("memory").queryName(s"prov_tot_$tag")
          .outputMode(OutputMode.Update()).start()
        try {
          st.addData(ev(1, 0, user = 7, value = 2.0),
            ev(2, 1, user = 7, value = 3.0), ev(3, 2, user = 8, value = 1.0))
          tq.processAllAvailable()
          st.addData(ev(4, 3, user = 7, value = 5.0))
          tq.processAllAvailable()
        } finally tq.stop()
        val sessions = spark.table(s"prov_sess_$tag")
          .select(col("user_id"), col("n_events"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        val totals = spark.table(s"prov_tot_$tag")
          .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
        (sessions, totals)
      } finally prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
    val (sessH, totH) = runOnce(hdfs, "hdfs")
    val (sessR, totR) = runOnce(rocks, "rocks")
    assert(sessH.nonEmpty && totH.nonEmpty, "parity fixture produced no rows")
    assert(sessH.sameElements(sessR),
      s"session windows diverge across providers: ${sessH.toSeq} vs ${sessR.toSeq}")
    assert(totH.sameElements(totR),
      s"running totals diverge across providers: ${totH.toSeq} vs ${totR.toSeq}")
  }
}
