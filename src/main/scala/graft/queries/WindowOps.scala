package graft.queries

import graft.Tables
import graft.Tables.{money, money6}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window functions (w1–w3) and the time-window family (s1–s3).
  *
  * s1–s3 are the *batch* twins of the Structured Streaming operators in
  * `graft.streaming` — identical windowing semantics (`window()` /
  * `session_window()`), which is what makes them oracle-checkable in DuckDB
  * while the streaming variants are covered by MemoryStream unit specs.
  *
  * Determinism: every window ORDER BY carries a unique tie-break column
  * (event_id / o_orderkey); timestamps are exported as epoch integers at the
  * µs precision both engines share (Tables.loadTable normalizes events.ts to
  * µs whatever the file's physical layout — micros-NTZ today, legacy nanos
  * truncated — so the oracle's epoch_us matches identically).
  *
  * Scale notes: all windows partition by a key (event_type / user_id /
  * o_custkey) — no global windows, so no single-partition sort bottleneck.
  * Sliding windows (s2) expand each row ×4 before aggregation; partial
  * aggregation collapses them map-side.
  */
object WindowOps {

  // ---- w1: top-3 per group by rank ----
  def w1Rank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("rk"))
  }

  val w1Sql: String =
    """SELECT event_type, rk, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
      |  FROM events)
      |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin

  // ---- w2: lag — per-user inter-event gap in µs ----
  def w2LagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("gap_us", col("ts_us") - col("prev_us"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
              col("prev_us"), col("gap_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val w2Sql: String =
    """SELECT user_id, event_id, ts_us, prev_us, ts_us - prev_us AS gap_us FROM (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  // ---- w3: running sum with an explicit frame ----
  def w3FrameSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_total",
        sum(money(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val w3Sql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin


  // ---- w4: ranking-distribution windows (ntile / percent_rank / cume_dist)
  // percent_rank = (rank-1)/(n-1) and cume_dist = rank_end/n are exact
  // rational values evaluated identically in both engines given the same
  // total order (value desc, event_id tie-break).
  def w4Ntile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("tile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("tile") === 1)
      .select(col("event_type"), col("event_id"), col("tile"),
              col("pct_rank"), col("cume"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val w4Sql: String =
    """SELECT event_type, event_id, tile, pct_rank, cume FROM (
      |  SELECT event_type, event_id,
      |         CAST(NTILE(4) OVER win AS BIGINT) AS tile,
      |         PERCENT_RANK() OVER win AS pct_rank,
      |         CUME_DIST() OVER win AS cume
      |  FROM events
      |  WINDOW win AS (PARTITION BY event_type ORDER BY value DESC, event_id))
      |WHERE tile = 1 ORDER BY event_type, event_id""".stripMargin

  // ---- w5: value-based RANGE frame (trailing one-hour window) ----
  // The remaining frame kind after w3's ROWS frame: RANGE frames bound by
  // VALUE distance on the order key — here each event aggregates every
  // same-user event in the trailing µs hour, the "sliding aggregate
  // per row" shape sessionization and rate-limiting features use. Peers
  // (equal ts_us) enter the frame together in both engines by RANGE
  // semantics, and the summed measure is exact decimal, so frame-internal
  // evaluation order (Spark's running scan vs DuckDB's segment tree)
  // cannot shift the result. Scale: one shuffle on user_id, per-partition
  // sort on ts_us — the same cost envelope as any window; the frame never
  // materializes (running aggregation), so a wide frame costs no memory.
  def w5RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("hour_sum",
        sum(expr("CAST(value AS DECIMAL(18,6))")).over(w).cast("double"))
      .withColumn("hour_cnt", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"), col("ts_us"),
              col("hour_sum"), col("hour_cnt"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val w5Sql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS hour_sum,
      |       COUNT(*) OVER win AS hour_cnt
      |FROM events
      |WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ---- w6: LOCF forward fill (last_value IGNORE NULLS) ----

  /** Last-observation-carried-forward — the gap-filling window semantic
    * telemetry/sensor pipelines run before any resampling: sparse
    * readings (here every 7th event carries one, manufactured in-plan so
    * both engines see the same sparsity) are forward-filled per user in
    * event-time order with `last_value(..., ignoreNulls)` over an
    * unbounded-preceding ROWS frame. Declared output is the per-user
    * audit: row count, original observation count, FILLED count (rows
    * that got a carried value), still-null head rows (before the user's
    * first observation nothing can be carried), and the exact decimal
    * checksum of the filled series — any mis-carry shifts it.
    *
    * 100 TB shape: one user_id-keyed shuffle + per-user sort shared by
    * the fill window and the audit aggregation; the frame is running
    * state (no per-row rescan). The ordering key (ts_us, event_id) is
    * total, so the carried value is deterministic under any partitioning.
    */
  def w6Locf(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("obs", when(col("event_id") % 7 === 0,
        expr("CAST(value AS DECIMAL(18,6))")))
      .withColumn("filled", last(col("obs"), ignoreNulls = true).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("obs")).as("n_obs"),
           count(when(col("obs").isNull && col("filled").isNotNull, 1))
             .as("n_filled"),
           count(when(col("filled").isNull, 1)).as("n_head_nulls"),
           sum(col("filled")).cast("double").as("filled_sum"))
      .orderBy(col("user_id"))
  }

  val w6Sql: String =
    """WITH f AS (
      |  SELECT user_id,
      |         CASE WHEN event_id % 7 = 0 THEN CAST(value AS DECIMAL(18,6)) END AS obs,
      |         LAST_VALUE(CASE WHEN event_id % 7 = 0 THEN CAST(value AS DECIMAL(18,6)) END
      |           IGNORE NULLS) OVER (PARTITION BY user_id
      |             ORDER BY epoch_us(ts), event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_rows, COUNT(obs) AS n_obs,
      |       COUNT(CASE WHEN obs IS NULL AND filled IS NOT NULL THEN 1 END) AS n_filled,
      |       COUNT(CASE WHEN filled IS NULL THEN 1 END) AS n_head_nulls,
      |       CAST(SUM(filled) AS DOUBLE) AS filled_sum
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- w7: linear interpolation between sparse observations ----

  /** The resampling companion to w6's LOCF: interior gaps are LINEARLY
    * interpolated between the surrounding observations, weighted by
    * event-time distance — the telemetry/feature-store gap-fill used when
    * a carried constant would bias a downstream model. Four ignore-nulls
    * window scans over ONE user_id shuffle + sort (prev/next value and
    * prev/next observation time; the forward pair is the same sort in a
    * CURRENT ROW..UNBOUNDED FOLLOWING frame, no second exchange), then a
    * pure map-side formula. Cross-engine float discipline: both engines
    * evaluate the IDENTICAL parenthesized IEEE tree
    * pv + (nv − pv) · ((t − pt) / (nt − pt)) on identical inputs, and the
    * audit checksum snaps each value to integer micro-units before
    * summing, so aggregation order cannot move a bit. Rows before the
    * first / after the last observation stay null (no extrapolation);
    * equal-time neighbors (nt = pt) fall back to the previous value
    * rather than dividing by zero.
    */
  def w7Interpolate(s: SparkSession, d: String): DataFrame = {
    val ord = Seq(col("ts_us"), col("event_id"))
    val wb = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("obs", when(col("event_id") % 7 === 0,
        expr("CAST(value AS DECIMAL(18,6))")))
      .withColumn("pv", last(col("obs"), ignoreNulls = true).over(wb))
      .withColumn("pt", last(when(col("obs").isNotNull, col("ts_us")),
        ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("obs"), ignoreNulls = true).over(wf))
      .withColumn("nt", first(when(col("obs").isNotNull, col("ts_us")),
        ignoreNulls = true).over(wf))
      .withColumn("interp",
        when(col("obs").isNotNull, col("obs").cast("double"))
          .when(col("pv").isNotNull && col("nv").isNotNull && col("nt") > col("pt"),
            expr("CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE)) * " +
              "(CAST(ts_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv").cast("double")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("obs")).as("n_obs"),
           count(when(col("obs").isNull && col("interp").isNotNull, 1))
             .as("n_interp"),
           count(when(col("interp").isNull, 1)).as("n_edge_nulls"),
           sum(expr("CAST(round(interp * 1000000) AS BIGINT)"))
             .as("interp_micro_sum"))
      .orderBy(col("user_id"))
  }

  val w7Sql: String =
    """WITH f AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |         CASE WHEN event_id % 7 = 0 THEN CAST(value AS DECIMAL(18,6)) END AS obs
      |  FROM events),
      |wv AS (
      |  SELECT user_id, ts_us, obs,
      |    LAST_VALUE(obs IGNORE NULLS) OVER wb AS pv,
      |    LAST_VALUE(CASE WHEN obs IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wb AS pt,
      |    FIRST_VALUE(obs IGNORE NULLS) OVER wf AS nv,
      |    FIRST_VALUE(CASE WHEN obs IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wf AS nt
      |  FROM f
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      |i AS (
      |  SELECT user_id, obs,
      |    CASE WHEN obs IS NOT NULL THEN CAST(obs AS DOUBLE)
      |         WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
      |           THEN CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE)) *
      |                (CAST(ts_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
      |         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN CAST(pv AS DOUBLE)
      |    END AS interp
      |  FROM wv)
      |SELECT user_id, COUNT(*) AS n_rows, COUNT(obs) AS n_obs,
      |       COUNT(CASE WHEN obs IS NULL AND interp IS NOT NULL THEN 1 END) AS n_interp,
      |       COUNT(CASE WHEN interp IS NULL THEN 1 END) AS n_edge_nulls,
      |       CAST(SUM(CAST(round(interp * 1000000) AS BIGINT)) AS BIGINT) AS interp_micro_sum
      |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- s1: tumbling 1-hour windows ----
  def s1Tumble(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(money6(col("value"))).cast("double").as("sum_value"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
              col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("win_start_ms"), col("event_type"))

  val s1Sql: String =
    """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS win_start_ms,
      |       event_type, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start_ms, event_type""".stripMargin

  // ---- s2: sliding 1-hour windows every 15 minutes ----
  def s2Sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
              col("event_type"), col("cnt"))
      .orderBy(col("win_start_ms"), col("event_type"))

  // Each event belongs to exactly 4 sliding windows: starts at
  // bucket15(ts) - k*15min for k in 0..3.
  val s2Sql: String =
    """SELECT win_start_ms, event_type, COUNT(*) AS cnt FROM (
      |  SELECT epoch_ms(time_bucket(INTERVAL '15 minutes', ts)) - k * 900000 AS win_start_ms,
      |         event_type
      |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
      |GROUP BY 1, 2 ORDER BY win_start_ms, event_type""".stripMargin

  // ---- s3: session windows (30-minute gap) per user ----
  def s3Session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("sess_start_us"),
              unix_micros(col("session_window.end")).as("sess_end_us"),
              col("n_events"))
      .orderBy(col("user_id"), col("sess_start_us"))

  // Gaps-and-islands: a new session starts when the gap >= 30 min; session
  // end = last event + gap (matches Spark's session_window.end).
  val s3Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |x AS (SELECT user_id, us,
      |        CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
      |             OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |y AS (SELECT user_id, us,
      |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM x)
      |SELECT user_id, MIN(us) AS sess_start_us,
      |       MAX(us) + 1800000000 AS sess_end_us, COUNT(*) AS n_events
      |FROM y GROUP BY user_id, sid ORDER BY user_id, sess_start_us""".stripMargin

  // ---- w8: calendar-grid resample with gap-fill ----

  /** Time-series regularization: resample each event_type's value stream
    * onto the fixed hourly grid spanning the corpus' observed range, with
    * empty hours materialized (n_events = 0) and the hourly micro-unit sum
    * carried forward LOCF — the step that turns irregular event streams
    * into the regular grid window features and forecasting models consume.
    * Distinct from w6/w7, which fill nulls on EXISTING rows; this key
    * CREATES the missing rows first (the `sequence` grid), then fills.
    *
    * 100 TB shape: one data-sized keyed aggregate collapses the stream to
    * the (type × hour) domain (map-side partials absorb the data); the
    * global span comes from an unpartitioned window over those AGGREGATED
    * rows (fe2's no-cross-join idiom — no single-row broadcast touches the
    * data path); the grid explode, left join, and LOCF window all run on
    * domain-sized tables (|types| · |hours| rows — years of hourly grid is
    * ~10⁴ rows per type). Epoch-millisecond longs end-to-end, so the grid
    * arithmetic is integer and timezone-free on both engines (s1's idiom).
    */
  def w8ResampleGrid(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .select(col("event_type"),
        unix_millis(date_trunc("hour", col("ts"))).as("hr_ms"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .groupBy(col("event_type"), col("hr_ms"))
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("vm_sum"))
    val grid = hourly
      .withColumn("lo", min(col("hr_ms")).over(Window.partitionBy()))
      .withColumn("hi", max(col("hr_ms")).over(Window.partitionBy()))
      .groupBy(col("event_type"))
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, 3600000L)")).as("hr_ms"))
    grid.join(hourly, Seq("event_type", "hr_ms"), "left")
      .select(col("event_type"), col("hr_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(
          last(col("vm_sum"), ignoreNulls = true).over(
            Window.partitionBy(col("event_type")).orderBy(col("hr_ms"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)).as("vm_locf"))
      .orderBy(col("event_type"), col("hr_ms"))
  }

  val w8Sql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hr_ms,
      |         CAST(round(value * 1000000) AS BIGINT) AS vm
      |  FROM events),
      |hourly AS (SELECT event_type, hr_ms, COUNT(*) AS n_events,
      |             CAST(SUM(vm) AS BIGINT) AS vm_sum
      |           FROM ev GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.event_type, g.hr_ms
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN (SELECT unnest(generate_series(
      |                (SELECT MIN(hr_ms) FROM hourly),
      |                (SELECT MAX(hr_ms) FROM hourly), 3600000)) AS hr_ms) g)
      |SELECT g.event_type, g.hr_ms,
      |       COALESCE(h.n_events, 0) AS n_events,
      |       COALESCE(LAST_VALUE(h.vm_sum IGNORE NULLS) OVER (
      |         PARTITION BY g.event_type ORDER BY g.hr_ms
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS vm_locf
      |FROM grid g LEFT JOIN hourly h USING (event_type, hr_ms)
      |ORDER BY event_type, hr_ms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w8_resample_grid" -> (w8ResampleGrid _),
    "w1_rank"      -> (w1Rank _),
    "w2_lag_lead"  -> (w2LagLead _),
    "w3_frame_sum" -> (w3FrameSum _),
    "w4_ntile"     -> (w4Ntile _),
    "w5_range_frame" -> (w5RangeFrame _),
    "w6_locf"      -> (w6Locf _),
    "w7_interpolate" -> (w7Interpolate _),
    "s1_tumble"    -> (s1Tumble _),
    "s2_sliding"   -> (s2Sliding _),
    "s3_session"   -> (s3Session _)
  )

  val oracles: Map[String, String] = Map(
    "w8_resample_grid" -> w8Sql,
    "w1_rank"      -> w1Sql,
    "w2_lag_lead"  -> w2Sql,
    "w3_frame_sum" -> w3Sql,
    "w4_ntile"     -> w4Sql,
    "w5_range_frame" -> w5Sql,
    "w6_locf"      -> w6Sql,
    "w7_interpolate" -> w7Sql,
    "s1_tumble"    -> s1Sql,
    "s2_sliding"   -> s2Sql,
    "s3_session"   -> s3Sql
  )
}
