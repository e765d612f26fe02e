package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators (e1–e5): the session/funnel/cohort family a
  * product-analytics user of the reference harness would run over the
  * events table — ordered funnels, cohort retention, rolling distinct
  * users, rank-based winsorization, and session transition matrices.
  *
  * Cross-engine determinism: timestamps are compared as epoch-µs integers
  * (`unix_micros` / `epoch_us`), week cohorts as DATEs from the shared
  * Monday `date_trunc('week')` convention, and every value statistic is
  * integer-exact (rank-selected micro-unit boundaries, counts) — no
  * floating aggregate whose fold order could differ between engines.
  *
  * Scale design (100 TB):
  *  - every per-user step (first-touch, session numbering, funnel stage
  *    times) shuffles ONCE keyed by user_id, and the downstream aggregates
  *    reuse that partitioning or reduce to per-group rows first;
  *  - the rolling-distinct day-explode moves (user, day) pairs — already
  *    deduplicated, ×7 — never raw events; the scaladoc on e3 names the
  *    HLL-sketch swap (a9 machinery) once exactness is negotiable;
  *  - no global windows: the only unpartitioned ORDER BY is the final
  *    ≤O(100)-row presentation sort.
  */
object EventAnalytics {

  private val SessionGapUs = 1800000000L // 30 min
  private val FunnelWindowUs = 1800000000L // 30 min per funnel step

  // ---- e1: ordered funnel view -> click -> purchase ----

  /** Strict ordered funnel: a user converts at stage 2 if their first
    * click lands within 30 minutes AFTER their first view, stage 3 if the
    * first purchase after that click lands within another 30 minutes.
    * "First event, then window from it" is the standard strict-order
    * funnel semantics (not "any triple in order").
    *
    * Shape: three per-user aggregates chained by user_id-keyed joins —
    * each stage's frontier is ONE row per qualifying user, so the joins
    * shrink monotonically; nothing here is ever wider than the user
    * dimension. The final result is three counter rows.
    */
  def e1Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("us") >= col("v_us") && col("us") <= col("v_us") + FunnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("us") >= col("c_us") && col("us") <= col("c_us") + FunnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    val n1 = views.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit("view").as("stage_name"), col("n_users"))
    val n2 = clicks.agg(count(lit(1)).as("n_users"))
      .select(lit(2L).as("stage"), lit("click").as("stage_name"), col("n_users"))
    val n3 = purchases.agg(count(lit(1)).as("n_users"))
      .select(lit(3L).as("stage"), lit("purchase").as("stage_name"), col("n_users"))
    n1.unionAll(n2).unionAll(n3).orderBy(col("stage"))
  }

  val e1Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS v_us FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT ev.user_id, MIN(us) AS c_us FROM ev JOIN v USING (user_id)
      |      WHERE event_type = 'click'
      |        AND us >= v_us AND us <= v_us + 1800000000
      |      GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, MIN(us) AS p_us FROM ev JOIN c USING (user_id)
      |      WHERE event_type = 'purchase'
      |        AND us >= c_us AND us <= c_us + 1800000000
      |      GROUP BY ev.user_id)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |       (SELECT COUNT(*) FROM v) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
      |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
      |ORDER BY stage""".stripMargin

  // ---- e2: weekly cohort retention matrix ----

  /** Cohort retention: users grouped by the Monday-truncated week of their
    * FIRST event; for each (cohort_week, week_offset) the count of cohort
    * users active in that later week. The standard growth-analytics
    * triangle. Week arithmetic stays integer (both trunc points share the
    * Monday convention, so the day diff is always a multiple of 7).
    *
    * Shape: first-touch is one user_id-keyed aggregate; activity is the
    * deduplicated (user, week) set; their join is user_id-keyed again, and
    * the matrix aggregate reduces to O(weeks²) rows.
    */
  def e2Retention(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohort = act.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
    act.join(cohort, "user_id")
      .select(col("user_id"),
        // dates export as ISO strings: both engines' DATE round-trips
        // through pandas differently (date vs datetime64), so the string
        // form is the cross-engine-stable declared type (f2 precedent)
        date_format(col("cwk"), "yyyy-MM-dd").as("cohort_week"),
        expr("CAST(datediff(wk, cwk) / 7 AS BIGINT)").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val e2Sql: String =
    """WITH act AS (SELECT DISTINCT user_id,
      |               CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS cwk FROM act GROUP BY user_id)
      |SELECT strftime(cwk, '%Y-%m-%d') AS cohort_week,
      |       CAST(date_diff('day', cwk, wk) / 7 AS BIGINT) AS week_offset,
      |       COUNT(DISTINCT user_id) AS n_active
      |FROM act JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // ---- e3: rolling 7-day distinct users per day ----

  /** Trailing-7-day distinct actives per day, EXACT: COUNT DISTINCT over a
    * sliding date window is not expressible as a window frame (Spark
    * rejects DISTINCT in frames), and re-scanning 7 days per day is 7×
    * waste — so each deduplicated (user, day) pair is exploded into the
    * ≤7 output days it contributes to and one distinct-aggregate keyed by
    * day finishes the job. The `off = 0` conditional distinct gives the
    * same-day actives from the same pass.
    *
    * 100 TB note: the explode moves the DEDUPED (user, day) set ×7 — at a
    * billion DAU-days that is still 7G skinny rows/day-range, fine for one
    * shuffle; when exactness is negotiable the drop-in replacement is a
    * per-day HLL sketch merged over the trailing frame (a9_hll_merge is
    * exactly that machinery), which moves O(days) sketches instead.
    */
  def e3RollingDistinct(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    act.select(col("user_id"), col("day"),
        explode(expr("sequence(0, 6)")).as("off"))
      .select(col("user_id"), col("off"),
        date_format(expr("date_add(day, CAST(off AS INT))"), "yyyy-MM-dd")
          .as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(when(col("off") === 0, col("user_id"))).as("n_day"),
           countDistinct(col("user_id")).as("n_7day"))
      .orderBy(col("day"))
  }

  val e3Sql: String =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT strftime(day + CAST(r.off AS INTEGER), '%Y-%m-%d') AS day,
      |       COUNT(DISTINCT CASE WHEN r.off = 0 THEN user_id END) AS n_day,
      |       COUNT(DISTINCT user_id) AS n_7day
      |FROM act CROSS JOIN (SELECT unnest(range(7)) AS off) r
      |GROUP BY 1 ORDER BY day""".stripMargin

  // ---- e4: rank-based winsorized statistics per event type ----

  /** Winsorized per-group statistics with RANK-SELECTED boundaries: the
    * clip points are the k-th smallest / k-th largest observed micro-unit
    * values (k = floor(5% · n)+1 from each end), not interpolated
    * percentiles — selection over integers is bit-reproducible across
    * engines, where interpolation arithmetic is a cross-engine fp
    * minefield. Output: the boundaries, the clipped-tail counts, and the
    * integer-exact winsorized sum.
    *
    * Shape: one window pass (rank + count per group, both over the same
    * partitioning, one shuffle), per-group boundary extraction to 5 rows,
    * broadcast back, integer clamp, final aggregate. At 100 TB the
    * boundary table is |groups| rows — always the broadcast side.
    */
  def e4Winsorize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("vm"), col("event_id"))
    val ranked = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val bounds = ranked
      .withColumn("k", expr("CAST(floor(0.05 * n) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === col("k") + 1, col("vm"))).as("lo_vm"),
           max(when(col("rn") === col("n") - col("k"), col("vm"))).as("hi_vm"))
    ranked.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           max(col("lo_vm")).as("lo_vm"),
           max(col("hi_vm")).as("hi_vm"),
           count(when(col("vm") < col("lo_vm"), 1)).as("n_clip_lo"),
           count(when(col("vm") > col("hi_vm"), 1)).as("n_clip_hi"),
           sum(expr("LEAST(GREATEST(vm, lo_vm), hi_vm)")).as("winsor_sum_vm"))
      .orderBy(col("event_type"))
  }

  val e4Sql: String =
    """WITH t AS (
      |  SELECT event_type, event_id,
      |         CAST(round(value * 1000000) AS BIGINT) AS vm,
      |         ROW_NUMBER() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(round(value * 1000000) AS BIGINT),
      |                                     event_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |b AS (SELECT event_type,
      |        MAX(CASE WHEN rn = CAST(floor(0.05 * n) AS BIGINT) + 1
      |                 THEN vm END) AS lo_vm,
      |        MAX(CASE WHEN rn = n - CAST(floor(0.05 * n) AS BIGINT)
      |                 THEN vm END) AS hi_vm
      |      FROM t GROUP BY event_type)
      |SELECT t.event_type, COUNT(*) AS n,
      |       MAX(lo_vm) AS lo_vm, MAX(hi_vm) AS hi_vm,
      |       COUNT(CASE WHEN vm < lo_vm THEN 1 END) AS n_clip_lo,
      |       COUNT(CASE WHEN vm > hi_vm THEN 1 END) AS n_clip_hi,
      |       CAST(SUM(LEAST(GREATEST(vm, lo_vm), hi_vm)) AS BIGINT)
      |         AS winsor_sum_vm
      |FROM t JOIN b ON t.event_type = b.event_type
      |GROUP BY t.event_type ORDER BY t.event_type""".stripMargin

  // ---- e5: session transition matrix ----

  /** Within-session event-type transition counts (the Markov matrix over
    * user journeys): sessions are the same 30-minute-gap numbering x57
    * uses, transitions are consecutive-event pairs inside a session.
    * Output carries both the pair count and the from-state total, so any
    * consumer can derive exact transition probabilities without a float
    * in the declared result.
    *
    * Shape: ONE user_id-keyed shuffle serves the gap window, the session
    * numbering, and the lead() — all three windows share the partitioning
    * (Catalyst reuses the exchange); the transition aggregate then
    * reduces to |types|² rows.
    */
  def e5Transitions(s: SparkSession, d: String): DataFrame = {
    val wOrder = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val e = Tables.events(s, d).select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
    val sess = e
      .withColumn("prev", lag(col("us"), 1).over(wOrder))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") >= lit(SessionGapUs), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
    val pairs = sess
      .withColumn("to_type", lead(col("event_type"), 1).over(wSess))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("n_from_total", sum(col("n_trans")).over(wFrom))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        col("n_from_total"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val e5Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      |           FROM events),
      |x AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
      |                       OR us - LAG(us) OVER w >= 1800000000
      |                     THEN 1 ELSE 0 END AS new_s
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |y AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM x),
      |p AS (SELECT event_type AS from_type,
      |        LEAD(event_type) OVER (PARTITION BY user_id, sid
      |                               ORDER BY us, event_id) AS to_type
      |      FROM y),
      |m AS (SELECT from_type, to_type, COUNT(*) AS n_trans FROM p
      |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_trans,
      |       CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
      |         AS n_from_total
      |FROM m ORDER BY from_type, to_type""".stripMargin

  // ---- e6: SCD type-2 dimension build (validity intervals) ----

  /** Slowly-changing-dimension type-2 build — the warehouse operator that
    * turns a change-event stream into versioned rows with validity
    * intervals. Here the tracked attribute is each user's event_type:
    * consecutive runs of the same type (ordered by (us, event_id), a
    * total order) collapse into one version row carrying
    * `[valid_from_us, valid_to_us)` (half-open; NULL upper bound and
    * is_current=true on the newest version), the 1-based version number,
    * and the run's event count.
    *
    * Scale shape: ONE user_id-keyed exchange serves everything — the
    * change-point lag(), the running-sum version stamp, the (user_id,
    * version) aggregate (HashPartitioning(user_id) already clusters it;
    * EnsureRequirements inserts nothing), and the lead() that closes each
    * interval with the successor's start. Round10Spec pins the
    * single-exchange plan. Per-user state is one row's worth in each
    * window — nothing accumulates. The version stamp is a window
    * SUM(int): the oracle CASTs it (and the interval bounds) to BIGINT —
    * the r9 x57 lesson, enforced by tools/check.py's dtype gate.
    */
  def e6Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val byVersion = Window.partitionBy(col("user_id")).orderBy(col("version"))
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull ||
             col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      // event_type is constant within a run; min() just makes the pick
      // deterministic for the planner
      .agg(min(col("event_type")).as("attr"),
           min(col("us")).as("valid_from_us"),
           count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy(col("user_id"), col("version"))
  }

  val e6Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      |           FROM events),
      |x AS (SELECT user_id, us, event_id, event_type,
      |        CASE WHEN LAG(event_type) OVER
      |               (PARTITION BY user_id ORDER BY us, event_id) IS NULL
      |             OR LAG(event_type) OVER
      |               (PARTITION BY user_id ORDER BY us, event_id)
      |               <> event_type
      |             THEN 1 ELSE 0 END AS chg
      |      FROM e),
      |y AS (SELECT user_id, us, event_type,
      |        SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |      FROM x),
      |g AS (SELECT user_id, version, MIN(event_type) AS attr,
      |        MIN(us) AS valid_from_us, COUNT(*) AS n_events
      |      FROM y GROUP BY user_id, version)
      |SELECT user_id, CAST(version AS BIGINT) AS version, attr,
      |       valid_from_us, n_events,
      |       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
      |         AS valid_to_us,
      |       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
      |         IS NULL AS is_current
      |FROM g ORDER BY user_id, version""".stripMargin

  // ---- e7: multi-touch attribution (first / last / linear) ----

  /** Marketing attribution over the touch→conversion graph: every
    * purchase credits the user's preceding view/click touches inside a
    * 7-day lookback, under the three standard models at once —
    * first-touch, last-touch, and linear (equal split). Output is the
    * per-channel credit ledger: first/last counts, touch volume, and
    * linear credit in exact integer micro-credits (each of a purchase's
    * k touches earns `1000000 div k`; integer floor division replays
    * identically in DuckDB, and per-purchase credit conservation is
    * within k-1 micro-units of 10⁶ by construction — Round10Spec pins
    * both).
    *
    * Scale shape: the touch↔purchase pairing is a user_id-keyed
    * equi-join with the lookback interval as residual (touches per user
    * per window bound the blowup — the lookback IS the state bound),
    * then the three models share ONE purchase-keyed exchange: both
    * row_number orders and the per-purchase count ride the same window
    * partition. The final channel rollup is a few-row aggregate.
    */
  private val E7LookbackUs = 7L * 24 * 3600 * 1000000 // 7 days in µs

  def e7Attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"),
        col("event_id").as("purchase_id"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("us").as("t_us"),
        col("event_id").as("touch_id"), col("event_type").as("channel"))
    val w = Window.partitionBy(col("purchase_id"))
    purchases.join(touches, Seq("user_id"))
      .filter(col("t_us") < col("p_us") &&
              col("t_us") >= col("p_us") - lit(E7LookbackUs))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("rn_first",
        row_number().over(w.orderBy(col("t_us"), col("touch_id"))))
      .withColumn("rn_last",
        row_number().over(w.orderBy(col("t_us").desc, col("touch_id").desc)))
      .groupBy(col("channel"))
      .agg(sum(when(col("rn_first") === 1, 1L).otherwise(0L)).as("n_first"),
           sum(when(col("rn_last") === 1, 1L).otherwise(0L)).as("n_last"),
           count(lit(1)).as("n_touches"),
           sum(expr("1000000L div k")).as("linear_micro"))
      .orderBy(col("channel"))
  }

  val e7Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      |            FROM events),
      |p AS (SELECT user_id, us AS p_us, event_id AS purchase_id FROM ev
      |      WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, us AS t_us, event_id AS touch_id,
      |             event_type AS channel FROM ev
      |      WHERE event_type IN ('view', 'click')),
      |j AS (SELECT p.purchase_id, t.channel, t.t_us, t.touch_id
      |      FROM p JOIN t USING (user_id)
      |      WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000),
      |r AS (SELECT purchase_id, channel,
      |        COUNT(*) OVER (PARTITION BY purchase_id) AS k,
      |        ROW_NUMBER() OVER (PARTITION BY purchase_id
      |          ORDER BY t_us, touch_id) AS rn_first,
      |        ROW_NUMBER() OVER (PARTITION BY purchase_id
      |          ORDER BY t_us DESC, touch_id DESC) AS rn_last
      |      FROM j)
      |SELECT channel,
      |       CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_first,
      |       CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_last,
      |       COUNT(*) AS n_touches,
      |       CAST(SUM(1000000 // k) AS BIGINT) AS linear_micro
      |FROM r GROUP BY channel ORDER BY channel""".stripMargin

  // ---- e8: RFM segmentation via value-domain quantile binning ----------

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic lifecycle-marketing cube: each user scored 1–5 per dimension,
    * output as the segment-cell histogram with its revenue.
    *
    * The interesting part is HOW the quintiles are computed. The textbook
    * ntile(5) needs a GLOBAL sort of the user table in one partition —
    * the single-partition-window trap (at 10⁹ users, one reducer sorts
    * everything). Instead each score is quantile-disc binning through the
    * metric's VALUE-DOMAIN CDF (dq7's discipline): aggregate users per
    * metric value, cumulative-sum over that domain-sized table, and score
    * every value as ceil(5·cdf) = (5·cum + n − 1) div n — equal metric
    * values share a score (quantile-disc tie semantics, deterministic on
    * both engines), and the user table is never globally sorted: users
    * join their score by metric VALUE (a domain-sized build side).
    * Recency is whole days behind the corpus max day (the 1-row watermark
    * broadcast, x19's avgdl shape); monetary is exact integer cents.
    */
  def e8RfmSegments(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("max_day"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val watermark = users.agg(max(col("max_day")).as("wm"))
    val metrics = users.crossJoin(broadcast(watermark))
      .select(col("user_id"),
        expr("datediff(wm, max_day)").cast("long").as("recency"),
        col("freq"), col("cents"))

    // quantile-disc score map for one metric: value -> ceil(5 * cdf)
    def scoreMap(metric: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val dom = metrics.groupBy(col(metric).as("v"))
        .agg(count(lit(1)).as("c"))
      dom
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nt", sum(col("c")).over(Window.partitionBy()))
        .select(col("v").as(metric),
          expr("(cum * 5 + nt - 1) div nt").as(s"${metric}_score"))
    }
    // recency scores 1 = most recent: the CDF runs over ascending recency,
    // so score 1 is the freshest quintile already; freq/cents score 5 =
    // heaviest, so flip those to the conventional direction
    metrics
      .join(scoreMap("recency"), Seq("recency"))
      .join(scoreMap("freq"), Seq("freq"))
      .join(scoreMap("cents"), Seq("cents"))
      .select(col("user_id"), col("recency_score").as("r_score"),
        expr("6 - freq_score").as("f_score"),
        expr("6 - cents_score").as("m_score"), col("cents"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents_total"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val e8Sql: String = {
    def cdf(metric: String) =
      s"""${metric}_map AS (
         |  SELECT v AS $metric,
         |         CAST((cum * 5 + nt - 1) // nt AS BIGINT) AS ${metric}_score
         |  FROM (SELECT v,
         |          CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         |            PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |          CAST(SUM(c) OVER () AS BIGINT) AS nt
         |        FROM (SELECT $metric AS v, COUNT(*) AS c
         |              FROM metrics GROUP BY 1)))""".stripMargin
    s"""WITH u AS (
       |  SELECT user_id, MAX(CAST(ts AS DATE)) AS max_day, COUNT(*) AS freq,
       |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
       |           AS cents
       |  FROM events GROUP BY user_id),
       |metrics AS (
       |  SELECT user_id,
       |         CAST(date_diff('day', max_day,
       |           (SELECT MAX(max_day) FROM u)) AS BIGINT) AS recency,
       |         freq, cents
       |  FROM u),
       |${cdf("recency")},
       |${cdf("freq")},
       |${cdf("cents")}
       |SELECT recency_score AS r_score, 6 - freq_score AS f_score,
       |       6 - cents_score AS m_score, COUNT(*) AS n_users,
       |       CAST(SUM(cents) AS BIGINT) AS cents_total
       |FROM metrics
       |JOIN recency_map USING (recency)
       |JOIN freq_map USING (freq)
       |JOIN cents_map USING (cents)
       |GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin
  }

  // ---- e9: activity streaks (gaps-and-islands) ---------------------------

  /** Longest consecutive-day activity streak per user, reported as the
    * corpus histogram (n_users per max-streak length) — the engagement
    * statistic behind streak badges and habit-formation analyses, and the
    * canonical GAPS-AND-ISLANDS window pattern: consecutive days collapse
    * to one island because day − row_number() is constant exactly on a run.
    * Days are epoch-day integers (unix ms div 86 400 000), so island
    * arithmetic is pure BIGINT on both engines — no date type crosses the
    * oracle boundary.
    *
    * 100 TB shape: (user, day) dedup is one keyed aggregate that map-side
    * partials absorb (events per user-day collapse before the exchange);
    * the row_number window rides the SAME user-keyed partitioning; island
    * lengths and per-user maxima are two more aggregates on
    * already-user-local rows (no new exchange); the final histogram is
    * domain-sized (≤ max streak length rows).
    */
  def e9ActivityStreaks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .distinct()
    days
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("day"))))
      .withColumn("isl", col("day") - col("rn"))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("max_streak"))
      .groupBy(col("max_streak")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("max_streak"))
  }

  val e9Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
      |  FROM events),
      |isl AS (
      |  SELECT user_id,
      |         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
      |           AS isl
      |  FROM days),
      |runs AS (SELECT user_id, isl, COUNT(*) AS len
      |         FROM isl GROUP BY user_id, isl),
      |mx AS (SELECT user_id, MAX(len) AS max_streak
      |       FROM runs GROUP BY user_id)
      |SELECT max_streak, COUNT(*) AS n_users
      |FROM mx GROUP BY max_streak ORDER BY max_streak""".stripMargin

  // ---- e10: conversion-lag histogram -------------------------------------

  /** Time-to-convert: for every user, the lag from their FIRST view to the
    * first purchase AFTER it, reported as the hour-bucketed histogram
    * (bucket capped at 72 h — the standard attribution-window tail bucket)
    * with the exact per-bucket lag sum in seconds. e1 counts who converts,
    * e7 assigns credit; this measures HOW LONG conversion takes — the
    * latency distribution behind attribution-window and retargeting-delay
    * choices. Users with no view, or no purchase after their first view,
    * are out of the population by definition.
    *
    * 100 TB shape: one user-keyed window (first-view timestamp) feeding a
    * purchase-row filter and one user-keyed aggregate — the window and the
    * aggregate ride the SAME user hash partition, so the stream crosses
    * ONE exchange; the histogram is a second, bucket-domain-sized
    * aggregate (≤ 73 rows out at any scale). All µs integers.
    */
  def e10ConversionLag(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("fv", min(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase" && col("us") > col("fv"))
      .groupBy(col("user_id"))
      .agg(min(col("us") - col("fv")).as("lag_us"))
      .select(least(expr("lag_us div 3600000000L"), lit(72L)).as("lag_bucket_h"),
        col("lag_us"))
      .groupBy(col("lag_bucket_h"))
      .agg(count(lit(1)).as("n_users"),
        expr("CAST(sum(lag_us div 1000000) AS BIGINT)").as("lag_s_sum"))
      .orderBy(col("lag_bucket_h"))
  }

  val e10Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |  WHERE event_type IN ('view', 'purchase')),
      |f AS (
      |  SELECT user_id, event_type, us,
      |         MIN(CASE WHEN event_type = 'view' THEN us END)
      |           OVER (PARTITION BY user_id) AS fv
      |  FROM ev),
      |lags AS (
      |  SELECT user_id, MIN(us - fv) AS lag_us
      |  FROM f WHERE event_type = 'purchase' AND us > fv
      |  GROUP BY user_id)
      |SELECT LEAST(lag_us // 3600000000, 72) AS lag_bucket_h,
      |       COUNT(*) AS n_users,
      |       CAST(SUM(lag_us // 1000000) AS BIGINT) AS lag_s_sum
      |FROM lags GROUP BY 1 ORDER BY lag_bucket_h""".stripMargin

  // ---- e11: CEP sequence-pattern matching (MATCH_RECOGNIZE shape) ----

  /** Complex-event-processing pattern counting — the SQL-standard
    * `MATCH_RECOGNIZE` / Flink-CEP primitive Spark has no native operator
    * for, expressed Spark-first: per (user, day), the event-type sequence
    * in total (ts, event_id) order is folded to a character string
    * (view→v, click→c, purchase→p, else o) and the non-overlapping
    * greedy-left-to-right count of the contiguous pattern `vcp`
    * (PATTERN (V C P) with AFTER MATCH SKIP PAST LAST ROW semantics) is
    * computed by the replace-and-measure identity
    * `(len(seq) − len(replace(seq, 'vcp', ''))) / 3` — both engines'
    * `replace` is sequential non-overlapping left-to-right, so the match
    * count is identical by construction, with no regex-dialect risk.
    *
    * Scale design (100 TB): ONE user-keyed shuffle; the per-group collect
    * is bounded by a user-DAY (not unbounded user history — the same
    * state-bounding a streaming CEP engine enforces with a window; x57's
    * sessionization is the gap-based alternative). Cross-midnight matches
    * are deliberately out of pattern scope, exactly as a windowed CEP
    * deployment defines them away.
    */
  def e11CepPattern(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' " +
          "WHEN 'purchase' THEN 'p' ELSE 'o' END").as("ch"))
      .withColumn("day", expr("us div 86400000000"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        expr("array_join(transform(array_sort(collect_list(struct(us, event_id, ch))), " +
          "x -> x.ch), '')").as("seq"))
      .select(col("user_id"), col("day"), col("n_events"),
        expr("CAST((length(seq) - length(replace(seq, 'vcp', ''))) div 3 AS BIGINT)")
          .as("n_vcp"))
      .orderBy(col("user_id"), col("day"))

  val e11Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |              WHEN 'purchase' THEN 'p' ELSE 'o' END AS ch
      |  FROM events),
      |g AS (
      |  SELECT user_id, us // 86400000000 AS day, COUNT(*) AS n_events,
      |         string_agg(ch, '' ORDER BY us, event_id) AS seq
      |  FROM e GROUP BY 1, 2)
      |SELECT user_id, CAST(day AS BIGINT) AS day, n_events,
      |       CAST((len(seq) - len(replace(seq, 'vcp', ''))) // 3 AS BIGINT) AS n_vcp
      |FROM g ORDER BY user_id, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e11_cep_pattern"     -> (e11CepPattern _),
    "e10_conversion_lag"  -> (e10ConversionLag _),
    "e9_activity_streaks" -> (e9ActivityStreaks _),
    "e8_rfm_segments"     -> (e8RfmSegments _),
    "e7_attribution"      -> (e7Attribution _),
    "e1_funnel"           -> (e1Funnel _),
    "e2_retention"        -> (e2Retention _),
    "e3_rolling_distinct" -> (e3RollingDistinct _),
    "e4_winsorize"        -> (e4Winsorize _),
    "e5_transitions"      -> (e5Transitions _),
    "e6_scd2"             -> (e6Scd2 _)
  )

  val oracles: Map[String, String] = Map(
    "e10_conversion_lag"  -> e10Sql,
    "e11_cep_pattern"     -> e11Sql,
    "e9_activity_streaks" -> e9Sql,
    "e8_rfm_segments"     -> e8Sql,
    "e7_attribution"      -> e7Sql,
    "e1_funnel"           -> e1Sql,
    "e2_retention"        -> e2Sql,
    "e3_rolling_distinct" -> e3Sql,
    "e4_winsorize"        -> e4Sql,
    "e5_transitions"      -> e5Sql,
    "e6_scd2"             -> e6Sql
  )
}
