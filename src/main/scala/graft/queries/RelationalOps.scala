package graft.queries

import graft.Tables
import graft.Tables.{money, money6}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-surface completeness: join shapes, multi-dimensional
  * aggregates, set algebra, and the scalar-function families every OLAP
  * engine in the reference's benchmark set (Shark/Impala/Hive/Redshift)
  * exposes.
  *
  * Scale notes per operator group:
  *  - j1 broadcasts both dims explicitly (region 5 rows, nation 25 rows —
  *    broadcast at any scale; the customer side never shuffles).
  *  - j2/j3 anti/semi joins let Catalyst plan broadcast variants when the
  *    right side is small; at 100 TB the orders side would be aggregated
  *    to distinct keys before the join by the optimizer (verified in plan).
  *  - j4 is an equi-join on s_nationkey with a non-equi residual — hash
  *    partitionable, no nested-loop blowup; the theta condition never
  *    becomes a cartesian product.
  *  - a2/a3 rollup/cube expand rows by grouping-set count on the map side,
  *    but partial aggregation collapses them before the shuffle.
  */
object RelationalOps {

  // ---- j1: star join through two broadcast dims ----
  def j1Broadcast(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           sum(money(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val j1Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---- j2: anti join (customers with no high-value order) ----
  // The filter keeps the result non-empty at every SF (a bare "no orders"
  // anti join is vacuously empty on this data — weak verification).
  def j2Antijoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val j2Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // ---- j3: semi join (customers with >=1 order) ----
  def j3Semijoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val j3Sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---- j4: theta join — equi key + non-equi residual ----
  def j4ThetaRange(s: SparkSession, d: String): DataFrame = {
    val a = Tables.supplier(s, d).select(col("s_suppkey").as("a_key"),
      col("s_nationkey").as("a_nat"), col("s_acctbal").as("a_bal"))
    val b = Tables.supplier(s, d).select(col("s_suppkey").as("b_key"),
      col("s_nationkey").as("b_nat"), col("s_acctbal").as("b_bal"))
    a.join(b, col("a_nat") === col("b_nat") && col("a_bal") < col("b_bal"))
      .groupBy(col("a_nat").as("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("s_nationkey"))
  }

  val j4Sql: String =
    """SELECT a.s_nationkey, COUNT(*) AS n_pairs
      |FROM supplier a JOIN supplier b
      |  ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
      |GROUP BY a.s_nationkey ORDER BY a.s_nationkey""".stripMargin

  // ---- j5: as-of join (each purchase -> user's most recent prior click) --
  // Spark has no ASOF JOIN operator; the idiomatic composition is a keyed
  // window carrying the running "last matching event" — one shuffle on
  // user_id, no range self-join, no N² band expansion. The DuckDB oracle
  // uses its native ASOF LEFT JOIN, proving operator-level equivalence.
  /** Core of j5 over any (event_id, user_id, event_type, ts_us) frame —
    * separated so the same-µs tie semantics are spec-testable with
    * constructed collisions (the generated testdata has none).
    */
  def j5Core(events: DataFrame): DataFrame = {
    // Order clicks BEFORE purchases at equal ts_us (type_rank tie-break) so a
    // same-microsecond click is inside the purchase's running-max frame —
    // matching the oracle's inclusive ASOF condition c.us <= p.ts_us.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("type_rank"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    events
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("type_rank",
        when(col("event_type") === "click", lit(0)).otherwise(lit(1)))
      .withColumn("click_us",
        when(col("event_type") === "click", col("ts_us")))
      .withColumn("last_click_us", max(col("click_us")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_click_us"))
      .orderBy(col("event_id"))
  }

  def j5AsofJoin(s: SparkSession, d: String): DataFrame =
    j5Core(Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts"))))

  val j5Sql: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS us FROM events
      |      WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us, c.us AS last_click_us
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.us <= p.ts_us
      |ORDER BY event_id""".stripMargin

  // ---- j6: interval (range) join via bucketization ----
  // Clicks landing inside the 10-minute window before each purchase. The
  // naive BETWEEN join has no equi-key (BroadcastNestedLoopJoin, O(|L|·|R|));
  // RangeJoin.pointInInterval buckets both sides on a 600 s band so the join
  // is an equi-join on the bucket with the exact range as residual — the
  // shuffle keys on the bucket and scales linearly.
  private val WindowUs = 600000000L // 10 min in µs

  def j6RangeBucket(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        (col("ts_us") - WindowUs).as("lo"), col("ts_us").as("hi"))
    graft.operators.RangeJoin
      .pointInInterval(clicks, purchases, "ts_us", "lo", "hi", WindowUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
      .orderBy(col("purchase_id"))
  }

  val j6Sql: String =
    s"""WITH c AS (SELECT event_id AS click_id, epoch_us(ts) AS ts_us
       |           FROM events WHERE event_type = 'click'),
       |p AS (SELECT event_id AS purchase_id, epoch_us(ts) - $WindowUs AS lo,
       |             epoch_us(ts) AS hi
       |      FROM events WHERE event_type = 'purchase')
       |SELECT p.purchase_id, COUNT(*) AS n_clicks, MIN(c.click_id) AS first_click
       |FROM p JOIN c ON c.ts_us BETWEEN p.lo AND p.hi
       |GROUP BY p.purchase_id ORDER BY purchase_id""".stripMargin

  // ---- j7: salted equi-join (deterministic skew mitigation) ----
  // Result is provably the plain orders⋈customer join — the salt spreads
  // each hot o_custkey over 8 sub-partitions while customer replicates 8×.
  def j7SaltedJoin(s: SparkSession, d: String): DataFrame =
    graft.operators.Salting
      .saltedJoin(Tables.orders(s, d), Tables.customer(s, d),
        "o_custkey", "c_custkey", salt = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment"))

  val j7Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- j8: co-located join over bucketed tables ----
  // The pre-shuffle strategy for REPEATED fact-fact joins: both sides are
  // written bucketBy(orderkey) into the warehouse once, and every subsequent
  // join on that key plans WITHOUT an Exchange on either side (asserted
  // structurally in BucketingSpec) — at 100 TB that's shuffling once at
  // ingest instead of once per pipeline run. The one-time bucketed write is
  // stamp-guarded against testdata regeneration and keyed by SF dir; the
  // oracle is the plain join, since bucketing must not change results.
  def j8BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val (ot, lt) = (s"graft_orders_b_$tag", s"graft_lineitem_b_$tag")
    val missing = !s.catalog.tableExists(ot) || !s.catalog.tableExists(lt)
    // stamp the whole dataset dir, not just lineitem: the build snapshots
    // BOTH orders and lineitem, so a regeneration touching only orders must
    // also invalidate the bucketed tables
    graft.sources.MultiFormat.ensureLayout(
      new java.io.File(d), s"${graft.Scratch.dir(s)}/graft_j8_stamp_$tag",
      force = missing) {
      // the default in-memory catalog forgets tables across JVMs while their
      // warehouse directories persist — drop BOTH, or saveAsTable rejects
      // the orphaned location
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq(ot, lt).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        def rm(f: java.io.File): Unit = if (f.exists()) {
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
          f.delete()
        }
        rm(new java.io.File(wh, t))
      }
      Tables.orders(s, d).write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable(ot)
      Tables.lineitem(s, d).write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").mode("overwrite").saveAsTable(lt)
    }
    s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  val j8Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- j11: dynamic partition pruning over a partitioned fact layout ----

  /** Dynamic partition pruning, demonstrated for real: orders written as a
    * HIVE-PARTITIONED layout on the derived month column (the one-time
    * fixture under the scratch dir, stamped like j8's bucketed tables),
    * then joined to a small month-dimension with a selective predicate on
    * a NON-join column (`m_minkey % 2 = 0` — deliberately not derivable
    * from the join key, so constraint propagation cannot turn it into a
    * static partition filter; the ONLY way the fact scan skips months is
    * the `dynamicpruning` subquery Catalyst plants in PartitionFilters,
    * fed by the reused dim broadcast). Round9Spec asserts the plan
    * carries it. This is THE 100 TB date-partitioned-fact access path:
    * the dim filter decides at runtime which partitions the fact scan
    * reads, and everything else is never listed, opened, or scanned.
    * The oracle replays the month derivation + dim filter over the raw
    * table — the partition layout must not change a single row.
    */
  // weak-keyed per session (same GC rationale as j12Memo), per-path inside
  private val j11Memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def j11Cached(s: SparkSession, path: String): DataFrame = {
    // memoized DataFrame: cachedParquet only runs on first construction,
    // so the artifact-read flag must be raised at LOOKUP time or later
    // bench trials would report cached_artifact:false (r13 verdict #2)
    Tables.ArtifactLog.touch()
    j11Memo.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(path, p => Tables.cachedParquet(s, p))
  }

  def j11DppJoin(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val root = s"${graft.Scratch.dir(s)}/graft_j11_$tag"
    val factDir = s"$root/fact"
    val dimDir = s"$root/dim"
    val rebuilt = graft.sources.MultiFormat.ensureLayout(
      new java.io.File(d), root,
      force = !new java.io.File(factDir).exists || !new java.io.File(dimDir).exists) {
      val withMonth = Tables.orders(s, d)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      withMonth.write.mode("overwrite").partitionBy("o_month").parquet(factDir)
      withMonth.groupBy(col("o_month"))
        .agg(min(col("o_orderkey")).as("m_minkey"))
        .coalesce(1).write.mode("overwrite").parquet(dimDir)
    }
    // partition discovery over a many-partition layout (~45 months × part
    // files > the 32-path parallel-listing threshold) legitimately runs a
    // distributed LISTING job on first touch; memoize the resolved
    // relation so later builder calls stay zero-job (the AuditSpec
    // re-build contract). When ensureLayout actually rebuilt (stamp miss —
    // e.g. the driver regenerated testdata mid-session), the memoized file
    // index is stale: drop the per-path entries before resolving.
    if (rebuilt) Option(j11Memo.get(s)).foreach { m =>
      m.remove(factDir); m.remove(dimDir)
    }
    val fact = j11Cached(s, factDir)
    val dim = j11Cached(s, dimDir).filter(col("m_minkey") % 2 === 0)
    fact.join(dim, Seq("o_month"))
      .groupBy(col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_month"))
  }

  val j11Sql: String =
    """WITH base AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderkey, o_totalprice
      |  FROM orders),
      |dim AS (SELECT o_month, MIN(o_orderkey) AS mk FROM base GROUP BY o_month)
      |SELECT b.o_month, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM base b JOIN dim ON dim.o_month = b.o_month AND dim.mk % 2 = 0
      |GROUP BY b.o_month ORDER BY b.o_month""".stripMargin

  // ---- j12: native runtime bloom-filter join pruning ----

  /** Catalyst's `InjectRuntimeFilter` — the ROW-level sibling of j11's
    * dynamic partition pruning, and the native form of x46's hand-built
    * bloom prune: a selective dim-side filter plants a `bloom_filter_agg`
    * subquery on the dim side and a `might_contain` predicate directly on
    * the fact scan, so a shuffle join's application side drops
    * non-joining rows BEFORE paying the exchange (bloom false positives
    * only cost re-checking at the join; correctness is unconditional).
    *
    * The rule deliberately only fires in the big-data regime: the
    * application side must actually shuffle (a bloom is pointless under a
    * broadcast join) and its scan must exceed
    * `spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
    * (10 GB default — the regime a 100 TB fact table is ALWAYS in, and
    * local testdata never is). So the key runs in a memoized
    * `newSession()` — own SQLConf over the shared SparkContext — with
    * broadcast off and the threshold floored: the 100 TB plan shape is
    * reproduced at any SF without leaking either knob to the other keys
    * in the same Verify/Bench run (conf-island discipline; Round9Spec
    * asserts the executed plan carries the injected `might_contain` on
    * the lineitem side AND that the parent session's confs stay stock).
    */
  // weak keys: a stopped parent session must stay GC-able — newSession()
  // children reference the context and shared state, never the parent, so
  // the entry dies exactly when the parent becomes unreachable
  private val j12Memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  def j12RuntimeBloom(s: SparkSession, d: String): DataFrame = {
    val iso = j12Memo.computeIfAbsent(s, parent => {
      val s2 = parent.newSession()
      // runtime confs do not survive newSession(); carry the two that
      // shape execution parity with the parent harness session
      s2.conf.set("spark.sql.shuffle.partitions",
        parent.conf.get("spark.sql.shuffle.partitions"))
      s2.conf.set("spark.sql.session.timeZone",
        parent.conf.get("spark.sql.session.timeZone"))
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2
    })
    val li = Tables.lineitem(iso, d)
    val pt = Tables.part(iso, d).filter(col("p_size") <= 5)
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
           sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  val j12Sql: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 5
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---- j14: AQE skew-join — runtime split of a skewed join partition ----

  /** The last claimed-but-unexercised row of SURVEY §4's optimizer table:
    * `OptimizeSkewedJoin`. The fact side joins on a key with a manufactured
    * dominant value — the canonical production skew shape, where a fact
    * FK's default/surrogate value ("unknown user", "anonymous session")
    * owns a large fraction of all rows: here ~95% of lineitem lands on
    * supplier 1. Under a plain sort-merge join that key's shuffle
    * partition is one straggler task that runs as long as the whole rest
    * of the stage; AQE's skew optimizer detects it from runtime map sizes
    * and splits it into advisory-sized sub-partitions, replicating the
    * matching build rows.
    *
    * Like j12's bloom threshold, the skew detector only fires in the
    * big-data regime (256 MB partition threshold) — so the key runs in a
    * memoized conf-island `newSession()` with the thresholds floored to
    * test-SF sizes and broadcast off (a broadcast join has no skew
    * problem; at 100 TB a 10⁸-row build side forces the shuffle join this
    * key reproduces). One more big-data precondition had to be
    * manufactured, not just conf-floored: AQE splits a skewed REDUCE
    * partition along MAP-output boundaries, so a fact side whose scan is a
    * single map task (one small parquet file at test SF) is unsplittable
    * no matter the thresholds — the explicit round-robin repartition below
    * reproduces the many-mappers shape every 100 TB scan has natively
    * (one map task per file split), and also BOUNDS the split fan-out:
    * the skewed partition can split into at most that many sub-reads, so
    * the floored 1k advisory size cannot explode task counts at larger
    * SFs. Round12Spec asserts the AQE final plan carries the skew=true
    * sort-merge join AND that the parent session's confs stay stock; the
    * oracle checks values, which skew splitting must not change.
    */
  private val j14Memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  def j14SkewJoin(s: SparkSession, d: String): DataFrame = {
    val iso = j14Memo.computeIfAbsent(s, parent => {
      val s2 = parent.newSession()
      s2.conf.set("spark.sql.shuffle.partitions",
        parent.conf.get("spark.sql.shuffle.partitions"))
      s2.conf.set("spark.sql.session.timeZone",
        parent.conf.get("spark.sql.session.timeZone"))
      s2.conf.set("spark.sql.adaptive.enabled", "true")
      s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // floor the big-data thresholds to fixture scale: a partition is
      // skewed if > max(threshold, factor × median) and splits into
      // advisory-sized chunks
      s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s2.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // pre-mark Tables.tune's guard: its engine-default 16m advisory would
      // silently overwrite the floored advisory above on the first
      // Tables.load in this island, making skew splits target 16m and
      // never fire at test SF (carry its other knob for posture parity)
      s2.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      s2.conf.set("spark.graft.tuned", "true")
      s2
    })
    val mappers = 2 * iso.conf.get("spark.sql.shuffle.partitions").toInt
    val fact = Tables.lineitem(iso, d).select(
      expr("CASE WHEN l_orderkey % 20 < 19 THEN 1L ELSE l_suppkey END").as("hk"),
      col("l_quantity"))
      .repartition(mappers) // the many-map-tasks shape — see scaladoc
    val supp = Tables.supplier(iso, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    fact.join(supp, col("hk") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
           sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("s_nationkey"))
  }

  val j14Sql: String =
    """SELECT s_nationkey, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM (SELECT CASE WHEN l_orderkey % 20 < 19 THEN 1 ELSE l_suppkey END AS hk,
      |             l_quantity FROM lineitem) f
      |JOIN supplier ON s_suppkey = hk
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---- c1: CBO join reorder over ANALYZE'd catalog statistics ----

  /** Cost-based join reordering — the last unexercised row of SURVEY §4's
    * optimizer table. Catalyst's `CostBasedJoinReorder` only fires when (a)
    * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled` are on
    * and (b) every base relation carries catalog statistics — which temp
    * views over bare parquet never do. So the key materializes EXTERNAL
    * catalog tables (zero data copied; LOCATION points at the existing
    * testdata parquet) and runs `ANALYZE TABLE … COMPUTE STATISTICS FOR
    * COLUMNS` over the join/filter columns once per (session, sfDir) — the
    * exact ceremony a real migration runs nightly at 100 TB so the
    * optimizer can order a star join by estimated cardinality instead of
    * syntax.
    *
    * The query is written in a deliberately BAD syntactic order — the
    * fact-fact-ish join first (`orders ⋈ customer`), the selective dim
    * (`nation` filtered to one region, 1/5 of rows) last — with broadcast
    * disabled so join ORDER is the lever under test. With stats present the
    * DP reorderer joins `customer ⋈ σ(nation)` first (5× customer
    * reduction) before touching orders; PlanRewriteSpec asserts the
    * optimized plan's inner join is exactly {customer, nation} and that the
    * parent session's confs stay stock (conf-island discipline, j12
    * precedent).
    */
  private val c1Memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())
  // per-(iso session, sfDir) one-time CREATE+ANALYZE; the weak key keeps a
  // stopped parent's island GC-able
  private val c1Analyzed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  /** The three external tables + analyzed columns (join keys + filter +
    * agg columns — what cardinality estimation actually reads).
    */
  private val c1Tables = Seq(
    "orders"   -> "o_custkey, o_totalprice",
    "customer" -> "c_custkey, c_nationkey",
    "nation"   -> "n_nationkey, n_regionkey, n_name")

  /** Sanitized per-sfDir table-name suffix (catalog identifiers can't
    * carry '/' or '.').
    */
  private def c1Tag(d: String): String =
    d.replaceAll("[^A-Za-z0-9]", "_").replaceAll("_+", "_").stripPrefix("_")

  def c1CboReorder(s: SparkSession, d: String): DataFrame = {
    val iso = c1Memo.computeIfAbsent(s, parent => {
      val s2 = parent.newSession()
      s2.conf.set("spark.sql.shuffle.partitions",
        parent.conf.get("spark.sql.shuffle.partitions"))
      s2.conf.set("spark.sql.session.timeZone",
        parent.conf.get("spark.sql.session.timeZone"))
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // with broadcast on, every dim join is a broadcast and order barely
      // matters at test SF; shuffle joins make order the measured lever —
      // and at 100 TB the orders⋈customer side IS a shuffle join
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2
    })
    val tag = c1Tag(d)
    val done = c1Analyzed.computeIfAbsent(iso,
      _ => java.util.Collections.synchronizedSet(new java.util.HashSet[String]()))
    if (done.add(d)) {
      // mark-before-run would make a mid-ceremony failure (one ANALYZE
      // throwing) permanently skip setup for this (session, sfDir) while
      // the key kept "passing" without stats; un-mark on failure so the
      // next call retries the whole DROP+CREATE+ANALYZE
      try c1Tables.foreach { case (t, cols) =>
        // DROP+CREATE rather than IF NOT EXISTS: the in-memory catalog is
        // shared per-context, so a fresh island in the same JVM must not
        // trust (or double-create) tables a previous session registered
        iso.sql(s"DROP TABLE IF EXISTS c1_${t}_$tag")
        iso.sql(s"CREATE TABLE c1_${t}_$tag USING parquet LOCATION '$d/$t.parquet'")
        iso.sql(s"ANALYZE TABLE c1_${t}_$tag COMPUTE STATISTICS FOR COLUMNS $cols")
      } catch { case e: Throwable => done.remove(d); throw e }
    }
    iso.sql(
      s"""SELECT n_name, COUNT(*) AS n_orders,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM c1_orders_$tag o
         |JOIN c1_customer_$tag c ON o.o_custkey = c.c_custkey
         |JOIN c1_nation_$tag n ON c.c_nationkey = n.n_nationkey
         |WHERE n.n_regionkey = 0
         |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  val c1Sql: String =
    """SELECT n_name, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE n.n_regionkey = 0
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---- l1: Z-order (Morton) clustering key for 2-D data layout ----
  // The OPTIMIZE-ZORDER primitive: interleave (user bucket, minute-of-day)
  // so sort-and-write by z makes any aligned 2-D rectangle near-contiguous
  // on disk — a (user range × time range) predicate then prunes row groups
  // by min/max stats instead of scanning a whole 1-D sort dimension. The
  // locality property itself is asserted in FunctionsSpec (an aligned 8×8
  // tile has dilation exactly 1.0 under z order vs ~7× under row-major);
  // this key oracle-checks the bit arithmetic end-to-end over events.
  def l1ZorderCluster(s: SparkSession, d: String): DataFrame = {
    graft.functions.ZOrderCode.register(s)
    Tables.events(s, d)
      .withColumn("x", pmod(col("user_id"), lit(1024L)))
      .withColumn("y", pmod(expr("unix_micros(ts) div 60000000"), lit(1440L)))
      .withColumn("z", expr("graft_zorder(x, y)"))
      .withColumn("zbucket", expr("z div 4096"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("cnt"), min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .orderBy(col("zbucket"))
  }

  // Sign-safe cross-engine arithmetic: Spark's pmod is always non-negative
  // and `div` truncates toward zero, while DuckDB's % follows the dividend
  // and // floors — replay Spark's semantics explicitly so negative user_id
  // or pre-epoch ts cannot diverge (latent with current data, but a trap).
  val l1Sql: String =
    """WITH e AS (
      |  SELECT ((user_id % 1024) + 1024) % 1024 AS x,
      |         (((CASE WHEN epoch_us(ts) >= 0 THEN epoch_us(ts) // 60000000
      |                 ELSE -((-epoch_us(ts)) // 60000000) END) % 1440) + 1440) % 1440 AS y
      |  FROM events),
      |zc AS (
      |  SELECT list_reduce(list_transform(range(0, 21),
      |    i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i+1))),
      |    (a, b) -> a + b) AS z
      |  FROM e)
      |SELECT z // 4096 AS zbucket, COUNT(*) AS cnt,
      |       MIN(z) AS min_z, MAX(z) AS max_z
      |FROM zc GROUP BY zbucket ORDER BY zbucket""".stripMargin

  // ---- a1: exact distinct ----
  def a1Distinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val a1Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL++ sketch distinct. The raw sketch value can't be oracle-checked
    * (DuckDB's approx algorithm differs), so the key exports the exact
    * COUNT(DISTINCT) wrapper instead: the sketch is still computed in-plan,
    * and `within_bound` asserts it lands inside 5× the declared 1% rsd —
    * the oracle side pins the exact count and expects the flag TRUE, which
    * turns a sketch regression into a hash mismatch instead of an unchecked
    * rows-only pass (SURVEY §2.2's "exact wrapper" option, r7 verdict #6).
    */
  def a1bApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
           countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("approx_users") - col("n_exact")) <= col("n_exact") * lit(0.05))
          .as("within_bound"))
      .orderBy(col("event_type"))

  val a1bSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- a9: mergeable HLL sketches (two-level union) ----

  /** MERGEABILITY — the property that makes sketch aggregation work at
    * 100 TB: per-shard sketches built independently (here per
    * (event_type, day)) UNION into exactly the sketch a single global
    * pass would have built, because HLL state is a per-bucket register
    * MAX — order- and grouping-independent. That is the two-level shape a
    * real deployment uses (daily sketches materialized once, unions
    * served per query, raw data never re-scanned). Uses Spark 4's
    * Apache DataSketches functions (`hll_sketch_agg` / `hll_union_agg` /
    * `hll_sketch_estimate`). Measured honesty note: the two-level
    * estimate is NOT bit-identical to the single-pass one — the union
    * targets HLL_8 and its composite estimator can differ by a few
    * registers' worth from a directly-built HLL_4 (sf0.1:
    * merged 1488 vs direct 1494 vs exact 1500) — but it IS deterministic
    * (register max is order/grouping independent) and stays inside the
    * sketch's error bound. Declared result follows the a1b exact-wrapper
    * doctrine: exact distinct counts plus three booleans — both
    * estimates within 5% of exact (generous vs lgK=12's ~1.6% RSE) and
    * the merged-vs-direct drift within 2%.
    */
  def a9HllMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day_ms", unix_millis(date_trunc("day", col("ts"))))
    val shard = ev.groupBy(col("event_type"), col("day_ms"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val merged = shard.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val direct = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_direct"),
           countDistinct(col("user_id")).as("n_exact"))
    direct.join(merged, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("est_merged") - col("n_exact")) <= col("n_exact") * lit(0.05))
          .as("merged_within_bound"),
        (abs(col("est_direct") - col("n_exact")) <= col("n_exact") * lit(0.05))
          .as("direct_within_bound"),
        (abs(col("est_merged") - col("est_direct")) <= col("n_exact") * lit(0.02))
          .as("merge_drift_small"))
      .orderBy(col("event_type"))
  }

  val a9Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
      |       TRUE AS merged_within_bound, TRUE AS direct_within_bound,
      |       TRUE AS merge_drift_small
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- a2: rollup ----
  def a2Rollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day_ms", unix_millis(date_trunc("day", col("ts"))))
      .rollup(col("event_type"), col("day_ms"))
      .agg(count(lit(1)).as("cnt"),
           sum(money6(col("value"))).cast("double").as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day_ms"))

  val a2Sql: String =
    """SELECT event_type, day_ms, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms, value FROM events)
      |GROUP BY ROLLUP(event_type, day_ms)
      |ORDER BY event_type ASC NULLS FIRST, day_ms ASC NULLS FIRST""".stripMargin

  // ---- a3: cube + grouping_id ----
  def a3Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
           sum(money(col("o_totalprice"))).cast("double").as("sum_price"),
           grouping_id().as("gid"))
      .orderBy(asc_nulls_first("o_orderstatus"),
               asc_nulls_first("o_orderpriority"))

  // DuckDB GROUPING(a,b) packs bits in the same (left=high) order as Spark's
  // grouping_id(), so the two agree row-for-row.
  val a3Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Sketch percentiles with an exact-wrapper oracle (same discipline as
    * a1b): the raw `percentile_approx` values can't be hash-compared (the
    * sketch differs from DuckDB's t-digest), so the key exports the exact
    * `percentile_disc` order statistics — DISC picks an actual data element
    * (SQL-standard first-value-with-cdf≥p), no interpolation arithmetic, so
    * both engines return the identical parquet double bit-for-bit — plus a
    * `within_bound` flag asserting the in-plan sketch lands within 2% of
    * exact. A sketch regression flips the flag → hash mismatch, instead of
    * the old unchecked rows-only pass.
    */
  def a5ApproxPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_extendedprice, array(0.5, 0.9), 10000)")
             .as("pcts"),
           expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
             .as("p50_disc"),
           expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")
             .as("p90_disc"))
      .select(col("l_returnflag"), col("p50_disc"), col("p90_disc"),
        (abs(element_at(col("pcts"), 1) - col("p50_disc")) <= col("p50_disc") * lit(0.02) &&
         abs(element_at(col("pcts"), 2) - col("p90_disc")) <= col("p90_disc") * lit(0.02))
          .as("within_bound"))
      .orderBy(col("l_returnflag"))

  val a5Sql: String =
    """SELECT l_returnflag,
      |       percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50_disc,
      |       percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90_disc,
      |       TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- a4: pivot (wide counts per event_type) ----
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def a4Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day_ms", unix_millis(date_trunc("day", col("ts"))))
      .groupBy(col("day_ms"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy(col("day_ms"))

  val a4Sql: String = {
    val cases = EventTypes
      .map(t => s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(", ")
    s"""SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, $cases
       |FROM events GROUP BY 1 ORDER BY day_ms""".stripMargin
  }

  // ---- a7: explicit GROUPING SETS (the general form rollup/cube sugar) ----
  def a7GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_a7")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       GROUPING_ID(o_orderstatus, o_orderpriority) AS gid
        |FROM graft_orders_a7
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val a7Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- a8: multi-distinct aggregation (the Expand-based plan) ----

  /** Several COUNT(DISTINCT ...) on DIFFERENT columns in one aggregate —
    * the one distinct-aggregation plan shape a1 (single distinct) doesn't
    * cover: Catalyst rewrites it through an Expand node that replicates
    * every input row once per distinct group (+ once for the plain
    * aggregates), then two-level-aggregates the expanded stream.
    * Scale note, visible in the plan: Expand multiplies the shuffled rows
    * by (#distinct-columns + 1) — at 100 TB exact multi-distinct is a
    * deliberate splurge, and the cheap alternative is a1b's
    * approx_count_distinct (one HLL per column, no Expand). This key
    * exists to cover — and price — the exact path.
    */
  def a8MultiDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
           countDistinct(col("o_orderpriority")).as("n_prios"),
           count(lit(1)).as("n_orders"),
           sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))

  val a8Sql: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
      |       COUNT(DISTINCT o_orderpriority) AS n_prios,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- a6: unpivot (wide measures -> long (measure, value) rows) ----
  // The inverse of a4's pivot: aggregate wide, then stack() to long form —
  // stack is the built-in Generator, so the unpivot is map-side only.
  def a6Unpivot(s: SparkSession, d: String): DataFrame =
    // orderkey-keyed widening (r18): the single-file scan runs the three
    // double→decimal casts + partial sums in 3 skewed tasks (~1 s CPU,
    // StageProbe); hash-repartitioning the 4-column projection on the
    // high-cardinality orderkey parallelizes the decimal work while the
    // partial aggregate still shrinks each partition to 3 rows before the
    // final exchange. Decimal sums are exact and associative, so the
    // result is partitioning-independent; identity at production scan
    // parallelism (widenIfStarved contract).
    graft.queries.PipelineOps.widenIfStarved(
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_orderkey")),
      col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
           sum(money(col("l_extendedprice"))).cast("double").as("sum_price"),
           sum(money6(col("l_discount"))).cast("double").as("sum_disc"))
      .select(col("l_returnflag"), expr(
        "stack(3, 'qty', sum_qty, 'price', sum_price, 'disc', sum_disc) as (measure, value)"))
      .orderBy(col("l_returnflag"), col("measure"))

  val a6Sql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, measure, value FROM (
      |  SELECT l_returnflag, 'qty' AS measure, sum_qty AS value FROM wide
      |  UNION ALL SELECT l_returnflag, 'price', sum_price FROM wide
      |  UNION ALL SELECT l_returnflag, 'disc', sum_disc FROM wide)
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---- f10: lateral correlated subquery (top-2 per key via LATERAL) ----
  // The LATERAL join surface: per-nation top-2 customers by balance.
  // Catalyst plans the correlated limited subquery via DomainJoin rewrite —
  // no per-row re-scan.
  def f10Lateral(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("graft_nation_f10")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_f10")
    s.sql(
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
        |FROM graft_nation_f10 n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM graft_customer_f10
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
  }

  val f10Sql: String =
    """SELECT n.n_name, c.c_custkey, c.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, c_acctbal FROM customer
      |         WHERE c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin

  // ---- f6: moment statistics from exact decimal sums ----
  // stddev/variance over doubles are aggregation-order-dependent; deriving
  // them from exact decimal moments (Σx, Σx²) makes them deterministic and
  // cross-engine identical: both engines evaluate the SAME double formula
  // on the SAME exact inputs.
  def f6Moments(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(money(col("l_extendedprice"))).cast("double").as("s1"),
           sum(money(col("l_extendedprice")) * money(col("l_extendedprice")))
             .cast("double").as("s2"))
      .select(col("l_returnflag"), col("n"),
        // decimal->double conversion of the huge second moment can differ
        // by 1 ulp across engines; round the derived stats at grids many
        // orders coarser than that noise
        round(col("s1") / col("n"), 6).as("mean_price"),
        round((col("s2") - col("s1") * col("s1") / col("n")) / col("n"), 2).as("var_pop"),
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n")), 6).as("stddev_pop"))
      .orderBy(col("l_returnflag"))

  val f6Sql: String =
    """SELECT l_returnflag, n, ROUND(s1 / n, 6) AS mean_price,
      |       ROUND((s2 - s1 * s1 / n) / n, 2) AS var_pop,
      |       ROUND(sqrt((s2 - s1 * s1 / n) / n), 6) AS stddev_pop
      |FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      |  FROM lineitem GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // ---- f18: correlation + linear regression from exact moments ----

  /** `corr` / `regr_slope` / `regr_intercept` — the bivariate-statistics
    * family (Redshift/Impala expose them natively) — computed the f6 way:
    * Spark's native corr/regr_* fold doubles in partition order
    * (non-deterministic across engines and runs), so the key aggregates
    * the EXACT decimal moments (n, Σx, Σy, Σx², Σxy, Σy²) and derives the
    * statistics from one identical double expression tree on both
    * engines, rounded at grids far coarser than the 1-ulp decimal→double
    * conversion noise. One shuffle, partial-aggregated; at 100 TB this is
    * strictly cheaper than the built-ins (same moments, exact instead of
    * order-dependent).
    */
  def f18Regression(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("l_quantity"))).cast("double").as("sx"),
        sum(money(col("l_extendedprice"))).cast("double").as("sy"),
        sum(money(col("l_quantity")) * money(col("l_quantity")))
          .cast("double").as("sxx"),
        sum(money(col("l_quantity")) * money(col("l_extendedprice")))
          .cast("double").as("sxy"),
        sum(money(col("l_extendedprice")) * money(col("l_extendedprice")))
          .cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"), 4)
          .as("intercept"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
               (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_xy"))
      .orderBy(col("l_returnflag"))

  val f18Sql: String =
    """SELECT l_returnflag, n,
      |       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept,
      |       ROUND((n * sxy - sx * sy) /
      |             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy
      |FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // ---- f19: exact interpolated quantiles (quantile_cont parity) ----

  /** EXACT percentiles — the complement of a5's approximate sketch: Spark's
    * `percentile` aggregate computes the textbook linear interpolation at
    * rank p·(n−1) over the sorted group, the same definition as DuckDB's
    * `quantile_cont` (and ANSI `PERCENTILE_CONT`). Inputs are cast to
    * DOUBLE on both engines so the interpolation arithmetic sees identical
    * operands; results are rounded at grids far coarser than any 1-ulp
    * interpolation noise. l_quantity lands on integers (sanity row);
    * l_extendedprice carries cents, so its quartiles genuinely
    * interpolate.
    *
    * 100 TB note: exact percentiles require the group's values — Spark's
    * implementation aggregates a per-group value-count map (partial
    * aggregation combines duplicates map-side). For high-cardinality
    * value domains at extreme scale the approximate a5 (KLL-class sketch)
    * is the swap; this key is the exactness contract for when the answer
    * must be right, e.g. SLA thresholds.
    */
  def f19ExactQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(CAST(l_quantity AS DOUBLE), array(0.25D, 0.5D, 0.9D))").as("qq"),
        expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.25D, 0.5D, 0.9D))").as("qp"))
      .select(col("l_returnflag"),
        round(element_at(col("qq"), 1), 6).as("qty_p25"),
        round(element_at(col("qq"), 2), 6).as("qty_p50"),
        round(element_at(col("qq"), 3), 6).as("qty_p90"),
        round(element_at(col("qp"), 1), 4).as("price_p25"),
        round(element_at(col("qp"), 2), 4).as("price_p50"),
        round(element_at(col("qp"), 3), 4).as("price_p90"))
      .orderBy(col("l_returnflag"))

  val f19Sql: String =
    """SELECT l_returnflag,
      |       ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS qty_p25,
      |       ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS qty_p50,
      |       ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS qty_p90,
      |       ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 4) AS price_p25,
      |       ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS price_p50,
      |       ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 4) AS price_p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- f7: scalar subquery (customers above global average balance) ----
  def f7ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_f7")
    s.sql(
      """SELECT c_custkey, c_acctbal FROM graft_customer_f7
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM graft_customer_f7)
        |ORDER BY c_custkey""".stripMargin)
  }

  val f7Sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // ---- f8: correlated scalar subquery (Catalyst decorrelation) ----
  // customers above their own nation's average balance; Catalyst rewrites
  // the correlated subquery into an aggregate + join (no per-row re-scan)
  def f8Correlated(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_f8")
    s.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal FROM graft_customer_f8 c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM graft_customer_f8 c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val f8Sql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin


  // ---- f9: MapType surface (from_json to map, map functions) ----
  def f9Map(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"), lit("map<string,bigint>")))
      .groupBy(col("event_type"))
      .agg(sum(element_at(col("m"), "k")).as("sum_k"),
           max(size(col("m"))).cast("long").as("max_entries"),
           count(when(map_contains_key(col("m"), "k"), 1)).as("n_with_k"))
      .orderBy(col("event_type"))

  val f9Sql: String =
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(MAX(len(json_keys(props))) AS BIGINT) AS max_entries,
      |       COUNT(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 END) AS n_with_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- set algebra ----
  def set1Except(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("key"))
      .except(Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("key")))
      .orderBy(col("key"))

  val set1Sql: String =
    """SELECT c_custkey AS key FROM customer
      |EXCEPT SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
      |ORDER BY key""".stripMargin

  def set2Intersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("key"))
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("key")))
      .orderBy(col("key"))

  val set2Sql: String =
    """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
      |INTERSECT SELECT o_custkey AS key FROM orders ORDER BY key""".stripMargin

  def set3Union(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("key"))
      .union(Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("key")))
      .distinct()
      .orderBy(col("key"))

  val set3Sql: String =
    """SELECT c_custkey AS key FROM customer WHERE c_acctbal < 0
      |UNION SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000
      |ORDER BY key""".stripMargin

  // ---- f1: JSON extraction (covers semi-structured / MapType surface) ----
  def f1Json(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  val f1Sql: String =
    """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       COUNT(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- f2: datetime functions ----
  def f2Date(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
               quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(count(lit(1)).as("cnt"),
           sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("yr"), col("qtr"))

  val f2Sql: String =
    """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  // ---- f3: string functions (substr is literally Q2's operator) ----
  def f3String(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("name_pfx"),
        length(col("c_name")).cast("long").as("name_len"),
        concat(lower(col("c_mktsegment")), lit("#"),
               col("c_nationkey").cast("string")).as("seg_tag"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("cust_num"))
      .orderBy(col("c_custkey"))

  val f3Sql: String =
    """SELECT c_custkey, upper(substr(c_name, 1, 8)) AS name_pfx,
      |       length(c_name) AS name_len,
      |       lower(c_mktsegment) || '#' || CAST(c_nationkey AS VARCHAR) AS seg_tag,
      |       regexp_extract(c_name, '([0-9]+)', 1) AS cust_num
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---- f4: arithmetic (decimal-exact revenue math, TPC-H Q1 flavor) ----
  def f4Math(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        // explicit ROUND to scale 2 before the double cast: DuckDB's decimal
        // downscale-by-CAST truncates while Spark's rounds, but ROUND is
        // half-away-from-zero in both; the rounded value's unscaled form is
        // < 2^53, so both engines then convert to double exactly
        round(sum(money(col("l_extendedprice")) * money6(lit(1) - col("l_discount"))), 2)
          .cast("double").as("sum_revenue"),
        sum(col("l_orderkey") % 7).as("mod_sum"),
        (sum(money(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  val f4Sql: String =
    """SELECT l_returnflag,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_revenue,
      |       CAST(SUM(l_orderkey % 7) AS BIGINT) AS mod_sum,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- f5: array functions over the embedding column ----
  def f5Array(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e_first"),
        element_at(col("embedding"), 64).cast("double").as("e_last"),
        col("label"))
      .orderBy(col("vec_id"))

  val f5Sql: String =
    """SELECT vec_id, len(embedding) AS dim,
      |       CAST(embedding[1] AS DOUBLE) AS e_first,
      |       CAST(embedding[64] AS DOUBLE) AS e_last, label
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- f11: higher-order array functions (lambda surface) ----
  // transform / filter / aggregate / zip_with over the embedding column —
  // the SQL-lambda surface a user reaches for before writing a UDF. Folds
  // run left-to-right over doubles in both engines (0.0 + x is exact), so
  // even the float sums hash-match unrounded.
  def f11Hof(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))")
          .as("sum_e"),
        expr("size(filter(embedding, x -> x > 0.0F))").cast("long").as("n_pos"),
        expr("CAST(element_at(transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 1) AS DOUBLE)")
          .as("first_x2"),
        expr("aggregate(zip_with(embedding, embedding, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("self_dot"))
      .orderBy(col("vec_id"))

  val f11Sql: String =
    """SELECT vec_id,
      |       list_reduce(list_prepend(0.0, list_transform(embedding, x -> x::DOUBLE)), (a, b) -> a + b) AS sum_e,
      |       len(list_filter(embedding, x -> x > 0.0)) AS n_pos,
      |       (embedding[1]::DOUBLE * 2.0) AS first_x2,
      |       list_reduce(list_prepend(0.0, list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b) AS self_dot
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- f12: recursive CTE (date spine + left join) ----
  // Spark 4's WITH RECURSIVE (UnionLoop) against DuckDB's: generate a
  // 60-day date spine by recursion, left-join daily order counts so
  // zero-order days survive as 0 — the calendar-densification query that
  // needs recursion (or a generator) in any engine. The recursion depth
  // (60) sits well inside spark.sql.cteRecursionLevelLimit's default.
  def f12RecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_f12")
    s.sql(
      """WITH RECURSIVE days AS (
        |  SELECT DATE'1995-01-01' AS d
        |  UNION ALL
        |  SELECT date_add(d, 1) AS d FROM days WHERE d < DATE'1995-03-01'
        |)
        |SELECT CAST(d AS STRING) AS day, COUNT(o_orderkey) AS n_orders
        |FROM days LEFT JOIN orders_f12 ON CAST(o_orderdate AS DATE) = d
        |GROUP BY d ORDER BY d""".stripMargin)
  }

  val f12Sql: String =
    """WITH RECURSIVE days AS (
      |  SELECT DATE '1995-01-01' AS d
      |  UNION ALL
      |  SELECT d + 1 FROM days WHERE d < DATE '1995-03-01'
      |)
      |SELECT CAST(d AS VARCHAR) AS day, COUNT(o_orderkey) AS n_orders
      |FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
      |GROUP BY d ORDER BY d""".stripMargin

  // ---- j9: full outer join (null-completing shuffle join) ----
  // The one outer-join shape the j-family lacked. Both sides are filtered
  // to force non-empty null-completion in BOTH directions (negative-balance
  // customers without big orders; big-order customers without negative
  // balance). Full outer can never broadcast — this key deliberately pins
  // the shuffle-join path with null generation on both sides; the
  // coalesced key keeps the contract total order unique.
  def j9FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_acctbal") < 0)
      .select(col("c_custkey"), col("c_acctbal"))
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(coalesce(c("c_custkey"), o("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_big_orders"))
      .orderBy(col("custkey"))
  }

  val j9Sql: String =
    """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
      |       c.c_acctbal AS c_acctbal, o.n_big_orders AS n_big_orders
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0) c
      |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_big_orders
      |                 FROM orders WHERE o_totalprice > 450000
      |                 GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin

  // ---- f14: bitwise aggregate family ----

  /** Bitwise AND/OR/XOR aggregates over grouped keys — flag-mask folding
    * (the OR of permission bits, the XOR parity fingerprint) is a standard
    * warehouse idiom and the one aggregate family f1–f13 didn't cover.
    * All-integer, order-independent (AND/OR/XOR are commutative and
    * associative), so partial aggregation and any partitioning produce
    * identical results.
    */
  def f14Bitwise(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("bit_and(user_id)").as("and_user"),
           expr("bit_or(user_id)").as("or_user"),
           expr("bit_xor(event_id)").as("xor_event"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val f14Sql: String =
    """SELECT event_type, bit_and(user_id) AS and_user,
      |       bit_or(user_id) AS or_user, bit_xor(event_id) AS xor_event,
      |       COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- f15: VARIANT semi-structured type (Spark 4 flagship) ----

  /** Spark 4's VARIANT type end-to-end: the existing `props` JSON is
    * parsed with `parse_json`, a RICHER document (nested object + array,
    * built in-plan from integer/string columns only — embedding doubles
    * in JSON text would hit engine formatting differences) is parsed to a
    * second variant, and typed path extraction (`variant_get` with long /
    * string targets, nested `$.m.k`, array index `$.tags[1]`, and a
    * missing path, which must yield NULL not an error) feeds a plain
    * aggregate. VARIANT is columnar-shredded binary under the hood — the
    * 100 TB answer to schema-on-read JSON blobs (no per-row text
    * re-parsing downstream of ingest). The oracle computes the same
    * aggregates straight from the base columns via DuckDB's JSON
    * extraction on `props` alone — a hash match proves every variant
    * construction/extraction round-trip exact.
    */
  def f15Variant(s: SparkSession, d: String): DataFrame =
    // event-keyed widening (r17): two parse_json + to_json round-trips per
    // row are ~100 us of CPU each — the most compute-dense map chain in
    // the relational family, measured 9.9 s serialized in the one-task
    // bench scan stage. Identity at production scan parallelism
    // (PipelineOps.widenIfStarved contract).
    graft.queries.PipelineOps.widenIfStarved(Tables.events(s, d), col("event_id"))
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'long')"))
      .withColumn("vm", expr("CAST(round(value * 1000000) AS BIGINT)"))
      // build the document with to_json, NOT string concat: to_json escapes
      // quotes/backslashes in event_type and OMITS a null k (a props row
      // without '$.k' then extracts as NULL on both engines — the same
      // row-survival semantics as the oracle's SUM over json_extract),
      // where raw concat would null the whole doc or emit malformed JSON
      .withColumn("doc", expr(
        "parse_json(to_json(named_struct(" +
          "'u', user_id, 'm', named_struct('k', k, 'vm', vm), " +
          "'tags', array('evt', event_type))))"))
      .select(
        expr("variant_get(doc, '$.tags[1]', 'string')").as("et"),
        expr("variant_get(doc, '$.m.k', 'long')").as("k2"),
        expr("variant_get(doc, '$.m.vm', 'long')").as("vm2"),
        expr("variant_get(doc, '$.u', 'long')").as("u"),
        expr("variant_get(doc, '$.missing', 'long')").as("miss"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"),
           sum(col("k2")).as("sum_k"),
           sum(col("vm2")).as("sum_vm"),
           countDistinct(col("u")).as("n_users"),
           count(col("miss")).as("n_missing"))
      .orderBy(col("et"))

  val f15Sql: String =
    """SELECT event_type AS et, COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_vm,
      |       COUNT(DISTINCT user_id) AS n_users,
      |       CAST(0 AS BIGINT) AS n_missing
      |FROM events GROUP BY event_type ORDER BY et""".stripMargin

  // ---- f16: ordered string aggregation (listagg WITHIN GROUP) ----

  /** Spark 4's ANSI `listagg` with an explicit WITHIN GROUP order — the
    * ordered string-fold warehouses use for ID rollups and debug digests.
    * Order inside an aggregate is exactly where engines silently diverge,
    * so the frame order is total ((event_id) is unique), and the declared
    * semantics are RANK-LIMITED: only the first 100 events per group (by
    * event_id) enter the fold. The limit is load-bearing at scale — an
    * unbounded listagg is per-group memory proportional to group size,
    * whereas `row_number() <= 100` triggers Spark's InsertWindowGroupLimit
    * rule (WindowGroupLimitExec, Partial mode before the exchange), so
    * every map task keeps at most 100 rows per group before the shuffle
    * and the final string is a bounded ~100-entry digest. For truly
    * unbounded sequences, x57's constant-width hash digest is the shape.
    */
  def f16Listagg(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("event_id"))
    Tables.events(s, d)
      .filter(col("event_id") % 199 === 0)
      .select(col("event_type"), col("event_id"), col("user_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100)
      .groupBy(col("event_type"))
      .agg(expr("listagg(user_id, ',') WITHIN GROUP (ORDER BY event_id)")
             .as("user_seq"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  val f16Sql: String =
    """WITH t AS (
      |  SELECT event_type, event_id, user_id,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)
      |           AS rn
      |  FROM events WHERE event_id % 199 = 0)
      |SELECT event_type,
      |       string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY event_id) AS user_seq,
      |       COUNT(*) AS n
      |FROM t WHERE rn <= 100
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- f17: ANSI-safe try_* arithmetic + width_bucket ----

  /** Spark 4 runs ANSI mode by default, so arithmetic faults THROW unless
    * handled — and `try_divide` / `try_add` / `try_multiply` (NULL on
    * div-zero/overflow instead of a job abort) are the production answer
    * for dirty numeric columns. The key manufactures both fault classes
    * in-plan: a divisor that is 0 for every 7th event, and a multiplier
    * that overflows Long for every 13th (user_id scaled to ~2⁶²·k). Also
    * `width_bucket`, the SQL bucketing primitive (here over `value` into
    * 10 equal bins). DuckDB has no try_* — the oracle replays the NULL
    * semantics explicitly (NULLIF for the division, a CASE on the
    * overflow predicate for the multiply), so a hash match proves the
    * try_* functions fault exactly where the arithmetic contract says.
    */
  def f17TryArithmetic(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vmicro"),
        (col("event_id") % 7).as("div7"),
        (col("event_id") % 13).as("mod13"))
      // integer-operand division (double quotient, NULL on zero divisor —
      // the ANSI fault) keeps both engines on one IEEE expression tree;
      // decimal/decimal division would round at engine-specific scales.
      // The overflow side multiplies by 2⁶² on every 13th event: any
      // user_id ≥ 1 overflows Long and try_multiply yields NULL.
      .select(
        expr("try_divide(vmicro, div7)").as("safe_div"),
        expr("try_multiply(user_id + 1, CASE WHEN mod13 = 0 " +
          "THEN 4611686018427387904L ELSE 1L END)").as("safe_mul"),
        expr("CAST(floor((value - -1000.0D) / ((1000.0D - -1000.0D) / 10)) + 1 AS BIGINT)")
          .as("raw_bucket"),
        expr("width_bucket(value, -1000.0D, 1000.0D, 10)").as("vbucket"))
      .groupBy(col("vbucket"))
      .agg(count(lit(1)).as("n"),
           count(col("safe_div")).as("n_div_ok"),
           count(col("safe_mul")).as("n_mul_ok"),
           sum(expr("CAST(round(safe_div * 1000) AS BIGINT)")).as("div_milli_sum"),
           count(when(col("raw_bucket") === col("vbucket"), 1)).as("n_bucket_agree"))
      .orderBy(col("vbucket"))

  val f17Sql: String =
    """WITH t AS (
      |  SELECT value,
      |         CAST(CAST(round(value * 1000000) AS BIGINT) AS DOUBLE)
      |           / NULLIF(CAST(event_id % 7 AS DOUBLE), 0) AS safe_div,
      |         CASE WHEN event_id % 13 = 0 AND user_id + 1 > 1 THEN NULL
      |              WHEN event_id % 13 = 0 THEN (user_id + 1) * 4611686018427387904
      |              ELSE user_id + 1 END AS safe_mul,
      |         CAST(floor((value - -1000.0) / ((1000.0 - -1000.0) / 10)) + 1
      |           AS BIGINT) AS raw_bucket,
      |         LEAST(GREATEST(
      |           CAST(floor((value - -1000.0) / ((1000.0 - -1000.0) / 10)) + 1
      |             AS BIGINT), 0), 11) AS vbucket
      |  FROM events)
      |SELECT vbucket, COUNT(*) AS n,
      |       COUNT(safe_div) AS n_div_ok,
      |       COUNT(safe_mul) AS n_mul_ok,
      |       CAST(SUM(CAST(round(safe_div * 1000) AS BIGINT)) AS BIGINT) AS div_milli_sum,
      |       COUNT(*) FILTER (WHERE raw_bucket = vbucket) AS n_bucket_agree
      |FROM t GROUP BY vbucket ORDER BY vbucket""".stripMargin

  // ---- j10: range join via the OPTIMIZER RULE (declared naive) ----

  /** The same click-in-window-before-purchase interval join as j6, but
    * DECLARED NAIVE — a plain `ts BETWEEN lo AND hi` join with no equi-key
    * — and planned by the flag-gated `RangeJoinRewrite` optimizer rule
    * instead of hand-bucketing. j6 proves the manual composition; this key
    * proves the RULE end-to-end: the oracle checks the rewritten plan's
    * results, and PlanRewriteSpec asserts the physical plan actually lost
    * its BroadcastNestedLoopJoin. A 5-minute window (vs j6's 10) keeps
    * the two keys' outputs distinct.
    *
    * Flag scoping (round-4 advice): a lazily-returned plan re-reads the
    * conf at every action, so a bare try/finally around construction
    * would unset the flag before the optimizer ever fired — instead the
    * flag-dependent join+agg is EXECUTED inside the scope (materialized
    * to the scratch dir, the x15 checkpoint pattern) and the previous
    * flag value restored before returning. No other query in the session
    * — before, between, or after — ever sees j10's bucket width.
    */
  private val J10WindowUs = 300000000L // 5 min in µs

  /** The flag-dependent plan itself, un-materialized and un-scoped — the
    * piece PlanRewriteSpec inspects with the flag set by hand.
    */
  private[graft] def j10Raw(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        (col("ts_us") - J10WindowUs).as("lo"), col("ts_us").as("hi"))
    clicks.join(purchases, col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
  }

  def j10RangeRule(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftPlanner.install(s)
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val path = s"${graft.Scratch.dir(s)}/graft_j10_out_$tag"
    // data-stamped: the flag-scoped execution runs once per corpus
    // snapshot; re-building the key is action-free (AuditSpec invariant)
    graft.sources.MultiFormat.ensureLayout(
      new java.io.File(s"$d/events.parquet"), path) {
      val flag = graft.plans.RangeJoinRewrite.Flag
      val prev = s.conf.getOption(flag)
      s.conf.set(flag, J10WindowUs.toString)
      try j10Raw(s, d).write.mode("overwrite").parquet(path)
      finally prev match {
        case Some(v) => s.conf.set(flag, v)
        case None    => s.conf.unset(flag)
      }
    }
    graft.Tables.cachedParquet(s, path).orderBy(col("purchase_id"))
  }

  val j10Sql: String =
    """SELECT p.purchase_id, COUNT(*) AS n_clicks, MIN(c.click_id) AS first_click
      |FROM (SELECT event_id AS click_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'click') c
      |JOIN (SELECT event_id AS purchase_id, epoch_us(ts) - 300000000 AS lo,
      |             epoch_us(ts) AS hi FROM events
      |      WHERE event_type = 'purchase') p
      |  ON c.ts_us >= p.lo AND c.ts_us <= p.hi
      |GROUP BY p.purchase_id ORDER BY p.purchase_id""".stripMargin

  // ---- f13: URL parsing (web-corpus provenance columns) ----

  /** URL decomposition — host/path/query extraction, the first step of any
    * web-crawl provenance pipeline (source attribution, per-domain caps,
    * robots filtering all key on the host). Spark side uses the native
    * `parse_url` expression (codegen'd, java.net.URI semantics); DuckDB has
    * no parse_url, so the oracle re-derives each part with RE2 regexes —
    * agreement proves the extraction semantics, not just the plumbing.
    * URLs are synthesized deterministically from documents columns (the
    * fixture corpus carries no real URLs; x25 precedent).
    */
  def f13Url(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id").cast("string"), lit("?lang="), col("lang"), lit("&ref=r"),
        pmod(col("doc_id"), lit(5))))
      .select(
        col("doc_id"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
      .orderBy(col("doc_id"))

  val f13Sql: String =
    """SELECT doc_id,
      |       regexp_extract(url, 'https://([^/]+)', 1) AS host,
      |       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      |       regexp_extract(url, '\?(.*)$', 1) AS query,
      |       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
      |FROM (
      |  SELECT doc_id,
      |         'https://' || source || '.example.com/docs/' || doc_id ||
      |         '?lang=' || lang || '&ref=r' || (doc_id % 5) AS url
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---- j13: nearest-event (bidirectional as-of) join ----

  /** For every purchase, the temporally NEAREST click by the same user —
    * in either direction (j5's ASOF is backward-only; recommendation and
    * attribution features routinely want the nearest interaction, not the
    * last). Ties between an equally-near earlier and later click resolve
    * backward (the earlier click), deterministically.
    *
    * Scale shape: this is NOT a join at all — both event streams merge
    * into ONE user-keyed window pass (two ignore-nulls running extremes
    * over the (ts, event_id)-ordered stream), so the only exchange is the
    * user hash partition and no purchase×click pairing ever materializes.
    * That unconditionally beats the union-of-two-ASOF-joins plan (two
    * merge joins + dedup) and is skew-safe up to a single user's history,
    * the same bound every per-user window in the library carries.
    */
  def j13NearestMatch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("click_ts",
        when(col("event_type") === "click", col("ts_us")))
      .withColumn("prev_click", last(col("click_ts"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_click", first(col("click_ts"), ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        expr("""CASE
                |  WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
                |  WHEN next_click IS NULL THEN ts_us - prev_click
                |  WHEN prev_click IS NULL THEN next_click - ts_us
                |  ELSE least(ts_us - prev_click, next_click - ts_us)
                |END""".stripMargin).as("dist_us"),
        expr("""CASE
                |  WHEN prev_click IS NULL AND next_click IS NULL THEN 'none'
                |  WHEN next_click IS NULL THEN 'back'
                |  WHEN prev_click IS NULL THEN 'fwd'
                |  WHEN ts_us - prev_click <= next_click - ts_us THEN 'back'
                |  ELSE 'fwd'
                |END""".stripMargin).as("direction"))
      .orderBy(col("event_id"))
  }

  val j13Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |         CASE WHEN event_type = 'click' THEN epoch_us(ts) END
      |           AS click_ts
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |x AS (
      |  SELECT *,
      |         LAST_VALUE(click_ts IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY ts_us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS prev_click,
      |         FIRST_VALUE(click_ts IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY ts_us, event_id
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |           AS next_click
      |  FROM ev)
      |SELECT event_id, user_id, ts_us,
      |       CASE
      |         WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
      |         WHEN next_click IS NULL THEN ts_us - prev_click
      |         WHEN prev_click IS NULL THEN next_click - ts_us
      |         ELSE LEAST(ts_us - prev_click, next_click - ts_us)
      |       END AS dist_us,
      |       CASE
      |         WHEN prev_click IS NULL AND next_click IS NULL THEN 'none'
      |         WHEN next_click IS NULL THEN 'back'
      |         WHEN prev_click IS NULL THEN 'fwd'
      |         WHEN ts_us - prev_click <= next_click - ts_us THEN 'back'
      |         ELSE 'fwd'
      |       END AS direction
      |FROM x WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j13_nearest_match"  -> (j13NearestMatch _),
    "j1_broadcast"       -> (j1Broadcast _),
    "f13_url"            -> (f13Url _),
    "j10_range_rule"     -> (j10RangeRule _),
    "f14_bitwise"        -> (f14Bitwise _),
    "f15_variant"        -> (f15Variant _),
    "f16_listagg"        -> (f16Listagg _),
    "f17_try_arithmetic" -> (f17TryArithmetic _),
    "j9_full_outer"      -> (j9FullOuter _),
    "j2_antijoin"        -> (j2Antijoin _),
    "j3_semijoin"        -> (j3Semijoin _),
    "j4_theta_range"     -> (j4ThetaRange _),
    "j5_asof_join"       -> (j5AsofJoin _),
    "j6_range_bucket"    -> (j6RangeBucket _),
    "j7_salted_join"     -> (j7SaltedJoin _),
    "j8_bucketed_join"   -> (j8BucketedJoin _),
    "j11_dpp_join"       -> (j11DppJoin _),
    "j12_runtime_bloom"  -> (j12RuntimeBloom _),
    "j14_skew_join"      -> (j14SkewJoin _),
    "c1_cbo_reorder"     -> (c1CboReorder _),
    "l1_zorder_cluster"  -> (l1ZorderCluster _),
    "a1_distinct"        -> (a1Distinct _),
    "a5_approx_percentile" -> (a5ApproxPercentile _),
    "a1b_approx_distinct" -> (a1bApproxDistinct _),
    "a9_hll_merge" -> (a9HllMerge _),
    "a2_rollup"          -> (a2Rollup _),
    "a3_cube"            -> (a3Cube _),
    "a4_pivot"           -> (a4Pivot _),
    "a6_unpivot"         -> (a6Unpivot _),
    "a7_grouping_sets"   -> (a7GroupingSets _),
    "a8_multi_distinct"  -> (a8MultiDistinct _),
    "f10_lateral"        -> (f10Lateral _),
    "f11_hof"            -> (f11Hof _),
    "f12_recursive_cte"  -> (f12RecursiveCte _),
    "f6_moments"         -> (f6Moments _),
    "f18_regression"     -> (f18Regression _),
    "f19_exact_quantiles" -> (f19ExactQuantiles _),
    "f7_scalar_subquery" -> (f7ScalarSubquery _),
    "f8_correlated"      -> (f8Correlated _),
    "f9_map"             -> (f9Map _),
    "set1_except"        -> (set1Except _),
    "set2_intersect"     -> (set2Intersect _),
    "set3_union"         -> (set3Union _),
    "f1_json"            -> (f1Json _),
    "f2_date"            -> (f2Date _),
    "f3_string"          -> (f3String _),
    "f4_math"            -> (f4Math _),
    "f5_array"           -> (f5Array _)
  )

  val oracles: Map[String, String] = Map(
    "j13_nearest_match"  -> j13Sql,
    "f13_url"        -> f13Sql,
    "j10_range_rule" -> j10Sql,
    "f14_bitwise"    -> f14Sql,
    "f15_variant"    -> f15Sql,
    "f16_listagg"    -> f16Sql,
    "f17_try_arithmetic" -> f17Sql,
    "j1_broadcast"   -> j1Sql,
    "j2_antijoin"    -> j2Sql,
    "j3_semijoin"    -> j3Sql,
    "j4_theta_range" -> j4Sql,
    "j5_asof_join"   -> j5Sql,
    "j6_range_bucket" -> j6Sql,
    "j7_salted_join" -> j7Sql,
    "j8_bucketed_join" -> j8Sql,
    "j11_dpp_join" -> j11Sql,
    "j12_runtime_bloom" -> j12Sql,
    "j14_skew_join"     -> j14Sql,
    "c1_cbo_reorder" -> c1Sql,
    "j9_full_outer" -> j9Sql,
    "l1_zorder_cluster" -> l1Sql,
    "a1_distinct"    -> a1Sql,
    "a5_approx_percentile" -> a5Sql,
    "a1b_approx_distinct" -> a1bSql,
    "a9_hll_merge" -> a9Sql,
    "a2_rollup"      -> a2Sql,
    "a3_cube"        -> a3Sql,
    "a4_pivot"       -> a4Sql,
    "a6_unpivot"     -> a6Sql,
    "a7_grouping_sets" -> a7Sql,
    "a8_multi_distinct" -> a8Sql,
    "f10_lateral"    -> f10Sql,
    "f11_hof"        -> f11Sql,
    "f12_recursive_cte" -> f12Sql,
    "f6_moments"     -> f6Sql,
    "f18_regression" -> f18Sql,
    "f19_exact_quantiles" -> f19Sql,
    "f7_scalar_subquery" -> f7Sql,
    "f8_correlated"  -> f8Sql,
    "f9_map"         -> f9Sql,
    "set1_except"    -> set1Sql,
    "set2_intersect" -> set2Sql,
    "set3_union"     -> set3Sql,
    "f1_json"        -> f1Sql,
    "f2_date"        -> f2Sql,
    "f3_string"      -> f3Sql,
    "f4_math"        -> f4Sql,
    "f5_array"       -> f5Sql
  )
}
