package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators (dq1–dq4): the validation layer every 100 TB
  * ingest runs before anything downstream trusts the data — single-pass
  * column profiling, referential-integrity orphan counts, declarative
  * constraint validation, and time-spine completeness. The Deequ/great-
  * expectations surface, expressed as plain declared queries so the same
  * oracle gate that checks analytics checks the checkers.
  *
  * Scale design:
  *  - dq1 profiles ALL columns in ONE scan — the multi-countDistinct
  *    rides Spark's Expand (a8 machinery), and the per-column result rows
  *    are projections of the single aggregate row, so profile cost is one
  *    pass regardless of column count;
  *  - dq2 counts orphans with key-projected left-anti joins: only the
  *    (child_key) and deduplicated (parent_key) columns ever shuffle,
  *    never the payload;
  *  - dq3 is one conditional aggregate per table — constraint count does
  *    not change pass count;
  *  - dq4 builds the day spine IN-PLAN from the observed min/max (one
  *    1-row broadcast), so the zero-fill join is spine-sized, not
  *    data-sized.
  *
  * Determinism: numeric min/max export in exact micro-units (BIGINT),
  * timestamps as epoch-µs, dates as ISO strings; no floating aggregate.
  */
object QualityOps {

  // ---- dq1: one-pass column profile of orders ----

  /** Per-column profile (count / nulls / distinct / min / max) of the
    * orders table, computed in ONE aggregate: numeric and timestamp
    * columns carry min/max in exact integer units (`*_num`), string
    * columns in `*_str`; the unused pair is a typed NULL. The per-column
    * rows are zero-scan projections of the single aggregate row.
    */
  def dq1Profile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val agg = o.agg(
      count(lit(1)).as("n_total"),
      count(col("o_orderkey")).as("ok_n"),
      countDistinct(col("o_orderkey")).as("ok_d"),
      min(col("o_orderkey")).as("ok_min"),
      max(col("o_orderkey")).as("ok_max"),
      count(col("o_custkey")).as("ck_n"),
      countDistinct(col("o_custkey")).as("ck_d"),
      min(col("o_custkey")).as("ck_min"),
      max(col("o_custkey")).as("ck_max"),
      count(col("o_totalprice")).as("tp_n"),
      countDistinct(col("o_totalprice")).as("tp_d"),
      min(expr("CAST(round(o_totalprice * 1000000) AS BIGINT)")).as("tp_min"),
      max(expr("CAST(round(o_totalprice * 1000000) AS BIGINT)")).as("tp_max"),
      count(col("o_orderdate")).as("od_n"),
      countDistinct(col("o_orderdate")).as("od_d"),
      // o_orderdate is TIMESTAMP_NTZ; the UTC session makes the cast to
      // instant-typed TIMESTAMP an identity, which unix_micros requires
      min(unix_micros(col("o_orderdate").cast("timestamp"))).as("od_min"),
      max(unix_micros(col("o_orderdate").cast("timestamp"))).as("od_max"),
      count(col("o_orderpriority")).as("op_n"),
      countDistinct(col("o_orderpriority")).as("op_d"),
      min(col("o_orderpriority")).as("op_min"),
      max(col("o_orderpriority")).as("op_max"),
      count(col("o_orderstatus")).as("os_n"),
      countDistinct(col("o_orderstatus")).as("os_d"),
      min(col("o_orderstatus")).as("os_min"),
      max(col("o_orderstatus")).as("os_max"))
    // ONE aggregate row exploded into per-column rows: a union of
    // per-column selects would let Catalyst column-prune each branch into
    // its own narrow aggregate + scan (6 scans); the explode keeps every
    // stat on the single aggregate subtree, so the table is read once and
    // the six distincts share one Expand.
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    def numRow(name: String, p: String) = struct(
      lit(name).as("column_name"), col("n_total"),
      (col("n_total") - col(s"${p}_n")).as("n_null"),
      col(s"${p}_d").as("n_distinct"),
      col(s"${p}_min").as("min_num"), col(s"${p}_max").as("max_num"),
      nullS.as("min_str"), nullS.as("max_str"))
    def strRow(name: String, p: String) = struct(
      lit(name).as("column_name"), col("n_total"),
      (col("n_total") - col(s"${p}_n")).as("n_null"),
      col(s"${p}_d").as("n_distinct"),
      nullL.as("min_num"), nullL.as("max_num"),
      col(s"${p}_min").as("min_str"), col(s"${p}_max").as("max_str"))
    agg.select(explode(array(
        numRow("o_orderkey", "ok"),
        numRow("o_custkey", "ck"),
        numRow("o_totalprice_micros", "tp"),
        numRow("o_orderdate_us", "od"),
        strRow("o_orderpriority", "op"),
        strRow("o_orderstatus", "os"))).as("p"))
      .select(col("p.*"))
      .orderBy(col("column_name"))
  }

  val dq1Sql: String =
    """WITH a AS (SELECT COUNT(*) AS n_total,
      |  COUNT(o_orderkey) AS ok_n, COUNT(DISTINCT o_orderkey) AS ok_d,
      |  MIN(o_orderkey) AS ok_min, MAX(o_orderkey) AS ok_max,
      |  COUNT(o_custkey) AS ck_n, COUNT(DISTINCT o_custkey) AS ck_d,
      |  MIN(o_custkey) AS ck_min, MAX(o_custkey) AS ck_max,
      |  COUNT(o_totalprice) AS tp_n, COUNT(DISTINCT o_totalprice) AS tp_d,
      |  MIN(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS tp_min,
      |  MAX(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS tp_max,
      |  COUNT(o_orderdate) AS od_n, COUNT(DISTINCT o_orderdate) AS od_d,
      |  MIN(epoch_us(o_orderdate)) AS od_min,
      |  MAX(epoch_us(o_orderdate)) AS od_max,
      |  COUNT(o_orderpriority) AS op_n, COUNT(DISTINCT o_orderpriority) AS op_d,
      |  MIN(o_orderpriority) AS op_min, MAX(o_orderpriority) AS op_max,
      |  COUNT(o_orderstatus) AS os_n, COUNT(DISTINCT o_orderstatus) AS os_d,
      |  MIN(o_orderstatus) AS os_min, MAX(o_orderstatus) AS os_max
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'o_orderkey' AS column_name, n_total, n_total - ok_n AS n_null,
      |         ok_d AS n_distinct, ok_min AS min_num, ok_max AS max_num,
      |         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |  FROM a
      |  UNION ALL SELECT 'o_custkey', n_total, n_total - ck_n, ck_d,
      |         ck_min, ck_max, NULL, NULL FROM a
      |  UNION ALL SELECT 'o_totalprice_micros', n_total, n_total - tp_n, tp_d,
      |         tp_min, tp_max, NULL, NULL FROM a
      |  UNION ALL SELECT 'o_orderdate_us', n_total, n_total - od_n, od_d,
      |         od_min, od_max, NULL, NULL FROM a
      |  UNION ALL SELECT 'o_orderpriority', n_total, n_total - op_n, op_d,
      |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), op_min, op_max FROM a
      |  UNION ALL SELECT 'o_orderstatus', n_total, n_total - os_n, os_d,
      |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), os_min, os_max FROM a)
      |ORDER BY column_name""".stripMargin

  // ---- dq2: referential-integrity orphan counts ----

  /** Foreign-key orphan audit across the star schema: for each declared
    * FK edge, the child row count and the count of child rows whose key
    * has no parent — ONE left-outer join + one aggregate per edge (an
    * anti-join-plus-count pair would scan the child twice and stitch the
    * two 1-row results with a nested-loop cross join). Joins are
    * key-projected — the child side reduces to its FK column, the parent
    * side to its deduplicated key — so at 100 TB the shuffles move only
    * key columns (and nation-sized parents broadcast automatically).
    */
  def dq2Referential(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
             parent: DataFrame, pk: String): DataFrame = {
      val keys = child.select(col(ck))
      val parents = parent.select(col(pk)).distinct()
      keys.join(parents, col(ck) === col(pk), "left")
        .agg(count(lit(1)).as("n_child"),
             count(when(col(pk).isNull, 1)).as("n_orphan"))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphan"))
    }
    edge("lineitem.l_orderkey->orders",
        Tables.lineitem(s, d), "l_orderkey", Tables.orders(s, d), "o_orderkey")
      .unionAll(edge("orders.o_custkey->customer",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"))
      .unionAll(edge("customer.c_nationkey->nation",
        Tables.customer(s, d), "c_nationkey", Tables.nation(s, d), "n_nationkey"))
      .orderBy(col("fk_edge"))
  }

  val dq2Sql: String =
    """SELECT * FROM (
      |  SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
      |         (SELECT COUNT(*) FROM lineitem) AS n_child,
      |         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
      |            (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
      |           AS n_orphan
      |  UNION ALL SELECT 'orders.o_custkey->customer',
      |         (SELECT COUNT(*) FROM orders),
      |         (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
      |            (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
      |  UNION ALL SELECT 'customer.c_nationkey->nation',
      |         (SELECT COUNT(*) FROM customer),
      |         (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
      |            (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)))
      |ORDER BY fk_edge""".stripMargin

  // ---- dq3: declarative constraint validation ----

  /** Constraint-violation counts: each declared invariant is one
    * conditional aggregate column, so the whole rule set for a table is
    * ONE scan regardless of rule count (the Deequ execution model). The
    * result carries (n_checked, n_violation) per rule — a rule that
    * checks zero rows is visibly vacuous, not silently green.
    */
  def dq3Constraints(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).agg(
      count(lit(1)).as("n"),
      count(when(col("l_quantity") <= 0, 1)).as("v_qty"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)).as("v_disc"),
      count(when(col("l_extendedprice") <= 0, 1)).as("v_price"),
      count(when(col("l_tax") < 0 || col("l_tax") > 1, 1)).as("v_tax"))
    val ev = Tables.events(s, d).agg(
      count(lit(1)).as("n"),
      count(when(col("value") < -1000 || col("value") > 1000, 1)).as("v_val"),
      count(when(!col("event_type").isin(
        "click", "view", "purchase", "signup", "error"), 1)).as("v_type"),
      count(when(year(col("ts")) =!= 2024, 1)).as("v_ts"))
    def row(src: DataFrame, name: String, v: String) = src.select(
      lit(name).as("constraint_name"), col("n").as("n_checked"),
      col(v).as("n_violation"))
    row(li, "lineitem.quantity_positive", "v_qty")
      .unionAll(row(li, "lineitem.discount_in_unit_range", "v_disc"))
      .unionAll(row(li, "lineitem.extendedprice_positive", "v_price"))
      .unionAll(row(li, "lineitem.tax_in_unit_range", "v_tax"))
      .unionAll(row(ev, "events.value_in_range", "v_val"))
      .unionAll(row(ev, "events.type_in_enum", "v_type"))
      .unionAll(row(ev, "events.ts_in_2024", "v_ts"))
      .orderBy(col("constraint_name"))
  }

  val dq3Sql: String =
    """WITH li AS (SELECT COUNT(*) AS n,
      |  COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS v_qty,
      |  COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS v_disc,
      |  COUNT(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS v_price,
      |  COUNT(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 END) AS v_tax
      |  FROM lineitem),
      |ev AS (SELECT COUNT(*) AS n,
      |  COUNT(CASE WHEN value < -1000 OR value > 1000 THEN 1 END) AS v_val,
      |  COUNT(CASE WHEN event_type NOT IN
      |    ('click','view','purchase','signup','error') THEN 1 END) AS v_type,
      |  COUNT(CASE WHEN year(ts) <> 2024 THEN 1 END) AS v_ts
      |  FROM events)
      |SELECT * FROM (
      |  SELECT 'lineitem.quantity_positive' AS constraint_name,
      |         n AS n_checked, v_qty AS n_violation FROM li
      |  UNION ALL SELECT 'lineitem.discount_in_unit_range', n, v_disc FROM li
      |  UNION ALL SELECT 'lineitem.extendedprice_positive', n, v_price FROM li
      |  UNION ALL SELECT 'lineitem.tax_in_unit_range', n, v_tax FROM li
      |  UNION ALL SELECT 'events.value_in_range', n, v_val FROM ev
      |  UNION ALL SELECT 'events.type_in_enum', n, v_type FROM ev
      |  UNION ALL SELECT 'events.ts_in_2024', n, v_ts FROM ev)
      |ORDER BY constraint_name""".stripMargin

  // ---- dq4: time-spine completeness ----

  /** Events-per-day over the COMPLETE day spine between the observed min
    * and max: a day with zero events appears as an explicit zero row, not
    * a silent hole. The spine is generated in-plan from the 1-row
    * observed-bounds aggregate (broadcast, then `sequence()` + explode),
    * so the zero-fill left join is spine-sized. This is the freshness /
    * completeness primitive behind every ingest SLA dashboard.
    */
  def dq4Completeness(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(to_date(col("ts")).as("day"))
    val counts = ev.groupBy(col("day")).agg(count(lit(1)).as("n_events"))
    val spine = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    spine.join(counts, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("day"))
  }

  val dq4Sql: String =
    """WITH c AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |           FROM events GROUP BY 1),
      |b AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      |      FROM events),
      |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
      |            INTERVAL 1 DAY)) AS DATE) AS day FROM b)
      |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
      |       COALESCE(c.n_events, 0) AS n_events
      |FROM spine LEFT JOIN c ON spine.day = c.day
      |ORDER BY day""".stripMargin

  // ---- dq5: cross-table sum reconciliation ----

  /** Fact-to-fact reconciliation: per order, the header total
    * (`o_totalprice`) against the lineitem-derived charge
    * `Σ extendedprice·(1−discount)·(1+tax)`, reduced to one summary row.
    * All comparison happens in exact micro-units (per-row double product
    * rounded ONCE to BIGINT — identical op order in both dialects — then
    * integer arithmetic only), so the verdict is bit-reproducible.
    *
    * Shape: one l_orderkey-keyed partial aggregate (map-side combine over
    * the biggest table), one orderkey equi-join, one final 1-row
    * aggregate — at 100 TB the shuffle carries (orderkey, BIGINT) pairs,
    * never lineitem payload. On this synthetic fixture the header totals
    * do NOT reconcile (n_exact=0) — the audit exists to report exactly
    * that, and the drift statistics are deterministic either way.
    */
  def dq5Reconcile(s: SparkSession, d: String): DataFrame = {
    val derived = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)"))
        .as("derived_micros"))
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      expr("CAST(round(o_totalprice * 1000000) AS BIGINT)").as("header_micros"))
    o.join(derived, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("header_micros"), col("derived_micros"),
        (col("header_micros") - col("derived_micros")).as("diff"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("derived_micros").isNull, 1)).as("n_no_lineitems"),
        count(when(col("diff") === 0L, 1)).as("n_exact"),
        count(when(abs(col("diff")) <= 10000L, 1)).as("n_within_1c"),
        max(abs(col("diff"))).as("max_abs_diff_micros"),
        sum(abs(col("diff"))).as("sum_abs_diff_micros"))
  }

  val dq5Sql: String =
    """WITH derived AS (
      |  SELECT l_orderkey,
      |         SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      |             * 1000000) AS BIGINT)) AS derived_micros
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT CAST(round(o_totalprice * 1000000) AS BIGINT) AS header_micros,
      |         derived_micros,
      |         CAST(round(o_totalprice * 1000000) AS BIGINT) - derived_micros
      |           AS diff
      |  FROM orders LEFT JOIN derived ON o_orderkey = l_orderkey)
      |SELECT COUNT(*) AS n_orders,
      |       COUNT(CASE WHEN derived_micros IS NULL THEN 1 END) AS n_no_lineitems,
      |       COUNT(CASE WHEN diff = 0 THEN 1 END) AS n_exact,
      |       COUNT(CASE WHEN abs(diff) <= 10000 THEN 1 END) AS n_within_1c,
      |       CAST(MAX(abs(diff)) AS BIGINT) AS max_abs_diff_micros,
      |       CAST(SUM(abs(diff)) AS BIGINT) AS sum_abs_diff_micros
      |FROM j""".stripMargin

  // ---- dq6: k-anonymity audit ----

  /** k-anonymity over the quasi-identifier pair
    * (c_nationkey, c_mktsegment): every equivalence class with its member
    * count and an `at_risk` flag for classes below k=10 — the groups a
    * privacy review must suppress or generalize before release. One
    * hash-aggregate shuffle on the quasi-identifier; class count is
    * bounded by the QI domain (|nations|·|segments|), so the result stays
    * tiny no matter the table size.
    */
  def dq6KAnonymity(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_members"),
        (col("n_members") < 10L).as("at_risk"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  val dq6Sql: String =
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_members,
      |       COUNT(*) < 10 AS at_risk
      |FROM customer GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---- dq7: two-sample KS distribution-drift audit ----

  /** Distribution drift between two document populations (lang='en' vs
    * the rest) over `n_chars`, as the exact two-sample Kolmogorov–Smirnov
    * statistic. D = max|F1−F2| is a rational with denominator n1·n2, so
    * the whole audit runs in INTEGER arithmetic — per-value counts, one
    * cumulative window, then max|ca·n2 − cb·n1| — and is bit-reproducible
    * across engines (no float CDFs, no ln/exp as PSI would need).
    *
    * Shape: one value-keyed aggregate (the only data-sized shuffle), then
    * windows over the DISTINCT VALUE DOMAIN — hundreds of rows here, and
    * bounded by the value domain (not the corpus) at any scale; for a
    * truly unbounded domain, pre-bucket the value first. The unpartitioned
    * window is domain-sized by construction, not a scale hazard. The
    * int64 cross products are exact while n1·n2 < 2^63 (≈3·10⁹ rows per
    * side — per-shard audit territory; swap to DECIMAL(38,0) beyond).
    * Emits numerator/denominator, a floor-division micro-unit D, and the
    * D > 0.1 drift verdict.
    */
  def dq7KsDrift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .groupBy(col("n_chars"))
      .agg(count(when(col("lang") === "en", 1)).as("a"),
           count(when(col("lang") =!= "en", 1)).as("b"))
    val cumW = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .select(col("n_chars"),
        sum(col("a")).over(cumW).as("ca"), sum(col("b")).over(cumW).as("cb"))
      .select(col("ca"), col("cb"),
        max(col("ca")).over(allW).as("n1"), max(col("cb")).over(allW).as("n2"))
      .agg(max(col("n1")).as("n_base"), max(col("n2")).as("n_compare"),
           max(abs(col("ca") * col("n2") - col("cb") * col("n1"))).as("ks_num"))
      .select(col("n_base"), col("n_compare"), col("ks_num"),
        (col("n_base") * col("n_compare")).as("ks_den"),
        expr("(ks_num * 1000000) div (n_base * n_compare)").as("ks_micros"),
        (col("ks_num") * 10 > col("n_base") * col("n_compare")).as("drifted"))
  }

  val dq7Sql: String =
    """WITH c AS (
      |  SELECT n_chars,
      |         COUNT(CASE WHEN lang = 'en' THEN 1 END) AS a,
      |         COUNT(CASE WHEN lang <> 'en' THEN 1 END) AS b
      |  FROM documents GROUP BY n_chars),
      |cum AS (
      |  SELECT SUM(a) OVER (ORDER BY n_chars
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |         SUM(b) OVER (ORDER BY n_chars
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      |  FROM c),
      |t AS (SELECT ca, cb, MAX(ca) OVER () AS n1, MAX(cb) OVER () AS n2
      |      FROM cum)
      |SELECT CAST(MAX(n1) AS BIGINT) AS n_base,
      |       CAST(MAX(n2) AS BIGINT) AS n_compare,
      |       CAST(MAX(abs(ca * n2 - cb * n1)) AS BIGINT) AS ks_num,
      |       CAST(MAX(n1) * MAX(n2) AS BIGINT) AS ks_den,
      |       CAST((MAX(abs(ca * n2 - cb * n1)) * 1000000)
      |            // (MAX(n1) * MAX(n2)) AS BIGINT) AS ks_micros,
      |       MAX(abs(ca * n2 - cb * n1)) * 10 > MAX(n1) * MAX(n2) AS drifted
      |FROM t""".stripMargin

  // ---- dq8: day-over-day volume anomaly detection ----

  /** Ingest-volume anomaly audit: each day's event count against the
    * median of the TRAILING 7 days (current day excluded — the baseline
    * must not contain the observation it judges), flagging spikes
    * (n > 1.5×median) and drops (n < 0.5×median). The median of ≤7
    * integers is an order statistic (or an exact x.5 interpolation), so
    * the baseline and both verdicts are bit-reproducible. Day one has no
    * baseline and is explicitly unflagged, not silently compared to 0.
    *
    * Shape: one data-sized aggregate to day counts, then a window over
    * the DAY DOMAIN (rows = days, not events) — same domain-window
    * discipline as dq7.
    */
  def dq8VolumeAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val trailing = Window.orderBy(col("day")).rowsBetween(-7, -1)
    days
      .withColumn("trailing_med",
        expr("percentile(n_events, 0.5D)").over(trailing))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n_events"),
        col("trailing_med"),
        (col("trailing_med").isNotNull &&
          col("n_events") * 2 > col("trailing_med") * 3).as("is_spike"),
        (col("trailing_med").isNotNull &&
          col("n_events") * 2 < col("trailing_med")).as("is_drop"))
      .orderBy(col("day"))
  }

  val dq8Sql: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |           FROM events GROUP BY 1),
      |m AS (SELECT day, n_events,
      |        median(n_events) OVER (ORDER BY day
      |          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trailing_med
      |      FROM d)
      |SELECT strftime(day, '%Y-%m-%d') AS day, n_events, trailing_med,
      |       trailing_med IS NOT NULL AND n_events * 2 > trailing_med * 3
      |         AS is_spike,
      |       trailing_med IS NOT NULL AND n_events * 2 < trailing_med
      |         AS is_drop
      |FROM m ORDER BY day""".stripMargin

  // ---- dq9: feed-freshness (timeliness) audit --------------------------

  /** Timeliness — the data-quality dimension dq1–dq8 don't cover: per
    * feed (event_type stands in for the upstream source), the lag of its
    * newest row behind the newest row anywhere, with a staleness flag at
    * the 24 h SLA. The table an ingestion dashboard renders directly.
    *
    * Scale design: ONE data-sized aggregate to the per-feed (n, max_ts)
    * rows; the global watermark is a max-window over those ≤ |feeds|
    * AGGREGATED rows. Lag in whole seconds (timestampdiff — integer on
    * both engines); timestamps leave the result as formatted strings so
    * the driver hash never meets an engine-specific timestamp era
    * (dq8's day-format discipline).
    */
  def dq9Freshness(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("max_ts"))
      .withColumn("watermark", max(col("max_ts")).over(Window.partitionBy()))
      .select(col("event_type"), col("n_events"),
        date_format(col("max_ts"), "yyyy-MM-dd HH:mm:ss").as("newest"),
        // whole-second truncation BEFORE differencing: DuckDB's
        // date_diff('second') counts boundary crossings, Spark's
        // timestampdiff counts full elapsed seconds — off by one when the
        // sub-second parts straddle a boundary; unix_timestamp floors
        // both ends to the boundary-crossing semantics
        expr("unix_timestamp(watermark) - unix_timestamp(max_ts)").as("lag_s"),
        expr("unix_timestamp(watermark) - unix_timestamp(max_ts) > 86400")
          .as("is_stale"))
      .orderBy(col("event_type"))
  }

  val dq9Sql: String =
    """WITH f AS (SELECT event_type, COUNT(*) AS n_events,
      |             MAX(ts) AS max_ts
      |           FROM events GROUP BY event_type),
      |w AS (SELECT *, MAX(max_ts) OVER () AS watermark FROM f)
      |SELECT event_type, n_events,
      |       strftime(max_ts, '%Y-%m-%d %H:%M:%S') AS newest,
      |       CAST(date_diff('second', max_ts, watermark) AS BIGINT) AS lag_s,
      |       date_diff('second', max_ts, watermark) > 86400 AS is_stale
      |FROM w ORDER BY event_type""".stripMargin

  // ---- dq10: Benford first-digit audit ----------------------------------

  /** First-significant-digit distribution of `events.value` against the
    * Benford expectation — the classic fraud/synthetic-data screen a
    * quality layer runs over monetary columns. Digit extraction is fully
    * integer and engine-portable: the first digit of the micro-unit BIGINT
    * (`round(value·10⁶)`) equals the value's first significant digit, and
    * integer→string rendering is identical in both engines, so no float
    * log10/pow boundary can misround a digit. The Benford expectations are
    * pinned integer-ppm literals (round(log10(1+1/d)·10⁶)); the deviation
    * column is what the audit alerts on.
    *
    * 100 TB shape: one scan → one 9-row aggregate (map-side partials absorb
    * the stream); the total for observed-ppm is a window over the 9
    * AGGREGATED rows. Output is 9 rows at any scale.
    */
  def dq10Benford(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expected = "CASE digit WHEN 1 THEN 301030L WHEN 2 THEN 176091L " +
      "WHEN 3 THEN 124939L WHEN 4 THEN 96910L WHEN 5 THEN 79181L " +
      "WHEN 6 THEN 66947L WHEN 7 THEN 57992L WHEN 8 THEN 51153L " +
      "ELSE 45757L END"
    Tables.events(s, d)
      .select(expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .filter(col("vm") > 0)
      .select(substring(col("vm").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("n * 1000000L div total").as("obs_ppm"),
        expr(expected).as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy(col("digit"))
  }

  val dq10Sql: String =
    """WITH m AS (
      |  SELECT CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
      |d AS (SELECT CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |      FROM m WHERE vm > 0),
      |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS total FROM g)
      |SELECT digit, n,
      |       CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
      |       CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
      |            WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
      |            WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
      |            ELSE 45757 END AS BIGINT) AS exp_ppm,
      |       CAST(n * 1000000 // total AS BIGINT)
      |         - CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
      |                WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
      |                WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
      |                ELSE 45757 END AS BIGINT) AS dev_ppm
      |FROM t ORDER BY digit""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq10_benford"     -> (dq10Benford _),
    "dq9_freshness"    -> (dq9Freshness _),
    "dq1_profile"      -> (dq1Profile _),
    "dq2_referential"  -> (dq2Referential _),
    "dq3_constraints"  -> (dq3Constraints _),
    "dq4_completeness" -> (dq4Completeness _),
    "dq5_reconcile"    -> (dq5Reconcile _),
    "dq6_kanonymity"   -> (dq6KAnonymity _),
    "dq7_ks_drift"     -> (dq7KsDrift _),
    "dq8_volume_anomaly" -> (dq8VolumeAnomaly _)
  )

  val oracles: Map[String, String] = Map(
    "dq10_benford"     -> dq10Sql,
    "dq9_freshness"    -> dq9Sql,
    "dq1_profile"      -> dq1Sql,
    "dq2_referential"  -> dq2Sql,
    "dq3_constraints"  -> dq3Sql,
    "dq4_completeness" -> dq4Sql,
    "dq5_reconcile"    -> dq5Sql,
    "dq6_kanonymity"   -> dq6Sql,
    "dq7_ks_drift"     -> dq7Sql,
    "dq8_volume_anomaly" -> dq8Sql
  )
}
