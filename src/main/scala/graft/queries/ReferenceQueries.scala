package graft.queries

import graft.Tables
import graft.Tables.{money, money6}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The four AMPLab Big Data Benchmark query families, re-expressed on the
  * local star schema. Reference semantics (amplab/benchmark
  * `runner/run_query.py`, QUERY_1a..QUERY_4):
  *
  *   Q1  scan + filter + project        (selectivity sweep a/b/c)
  *   Q2  substring group key + SUM      (group-cardinality sweep)
  *   Q3  join + agg + ORDER BY LIMIT 1  (join-input sweep via date BETWEEN)
  *   Q4  UDTF row explosion + re-agg    (url_count.py TRANSFORM analog)
  *
  * Scale notes: Q1 is a pure pushed-down parquet scan (PushedFilters carries
  * the predicate; ReadSchema is 3 columns). Q2/Q3 are partial+final hash
  * aggregates; the only shuffle is on the group key. Q3's join shuffles both
  * sides on the key at 100 TB — customer is the smaller side and Spark's
  * size-based planning broadcasts it at real scale factors; we keep the plan
  * declarative so AQE can choose. Q4 is explode + two-level aggregation with
  * map-side partial counts.
  */
object ReferenceQueries {

  // ---- Q1: SELECT pageURL, pageRank FROM rankings WHERE pageRank > X ----
  private def q1(threshold: Double)(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_extendedprice") > threshold)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def q1a(s: SparkSession, d: String): DataFrame = q1(100000.0)(s, d)
  def q1b(s: SparkSession, d: String): DataFrame = q1(50000.0)(s, d)
  def q1c(s: SparkSession, d: String): DataFrame = q1(10000.0)(s, d)

  private def q1Sql(threshold: String): String =
    s"""SELECT l_orderkey, l_linenumber, l_extendedprice
       |FROM lineitem WHERE l_extendedprice > $threshold
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- Q2: SELECT SUBSTR(sourceIP,1,X), SUM(adRevenue) GROUP BY 1 ----
  private def q2(prefixLen: Int)(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(substring(col("o_orderpriority"), 1, prefixLen).as("prio_prefix"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total_price"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("prio_prefix"))

  def q2a(s: SparkSession, d: String): DataFrame = q2(1)(s, d)
  def q2b(s: SparkSession, d: String): DataFrame = q2(3)(s, d)

  /** Q2's c-variant is the high-group-cardinality end of the sweep
    * (SUBSTR(sourceIP,1,12) ≈ hundreds of millions of groups upstream);
    * priority prefixes cap at 5 groups, so the c-variant keys on an
    * orderkey prefix instead — same substring-group-by operator, thousands
    * of groups, scaling with SF.
    */
  def q2c(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(substring(col("o_orderkey").cast("string"), 1, 4).as("key_prefix"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total_price"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("key_prefix"))

  val q2cSql: String =
    """SELECT substr(CAST(o_orderkey AS VARCHAR), 1, 4) AS key_prefix,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY key_prefix""".stripMargin

  /** Q2's true group-cardinality stress — the reference's defining axis for
    * this family (upstream 2c: SUBSTR(sourceIP,1,12) ≈ hundreds of millions
    * of groups). q2c caps at ~10⁴ groups; this variant keys on an 8-char
    * prefix of a Knuth-hashed orderkey, which is near-injective at test SFs
    * (~1.5×10⁵ groups at sf0.1, growing linearly with SF) — the partial→final
    * hash-agg path runs under real group-count pressure: per-partition
    * partial maps overflow their fixed budget and fall back to sort-based
    * merge, the exact behavior a ~10⁸-group run exercises per-executor at
    * 100 TB. All-integer key arithmetic (o_orderkey ≤ 6×10⁶ even at sf10, so
    * the product stays ≤ 1.6×10¹⁶ ≪ 2⁶³) replays exactly in DuckDB.
    */
  def q2d(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(substring(((col("o_orderkey") * lit(2654435761L)) % lit(1000000007L))
        .cast("string"), 1, 8).as("key_prefix"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total_price"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("key_prefix"))

  val q2dSql: String =
    """SELECT substr(CAST((o_orderkey * 2654435761) % 1000000007 AS VARCHAR), 1, 8) AS key_prefix,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY key_prefix""".stripMargin

  /** Q2 sweep endpoint: group-per-row aggregation. The composite
    * `orderkey-linenumber` key is near-unique over lineitem (~457k groups
    * for 600k rows at sf0.1 — 3× q2d and the maximum group cardinality the
    * dataset offers; upstream's ~2.5×10⁸-group run is this same shape at
    * its SF). Partial aggregation is pure overhead here — every partial map
    * fills with singleton groups and falls back to sort-based merge — which
    * is precisely the pathology a 100 TB Q2c run meets per-executor, and
    * the pathology the (unmerged — SPARK-31973; NOT in OSS Spark 4.1.2,
    * verified against SQLConf) skip-partial-aggregation proposal targets.
    * The lever this library ships for the regime is [[presorted]]:
    * repartition the raw rows on the group key so the whole aggregation
    * runs co-located in one stage, making the partial phase harmless
    * instead of trying (and failing, in OSS Spark) to skip it. Conf
    * `spark.graft.q2.prepartition` flips the q2e/q2f/q2g plan shape at
    * DataFrame-build time; results are bit-identical (ScaleProbe
    * `agglever` mode fingerprints both shapes and times them). Wider agg
    * list than q2d so the aggregation buffers carry multiple columns, not
    * one counter.
    */
  def q2e(s: SparkSession, d: String): DataFrame =
    q2Grouped(s, Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity")),
      intKeys = Seq("l_orderkey", "l_linenumber"),
      lineKey = concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")),
      aggs = Seq(
        sum(money(col("l_extendedprice"))).cast("double").as("total_price"),
        sum(money(col("l_quantity"))).cast("double").as("total_qty"),
        count(lit(1)).as("n_lines")))
      .select(col("line_key"), col("total_price"), col("total_qty"),
        col("n_lines"))
      .orderBy(col("line_key"))

  /** The q2e/f/g high-cardinality plan-shape lever: when
    * `spark.graft.q2.prepartition` is true (the DEFAULT, read at
    * plan-build time), shuffle the RAW rows by the group key first, so the
    * aggregate runs as partial+final back-to-back in one co-located stage
    * — every group is complete within its partition, and EnsureRequirements
    * inserts no mid-aggregate exchange. When false, keep the stock
    * partial→shuffle→final hash path, whose 100%-singleton partial maps
    * (pure overhead in this regime: partial combining collapses nothing)
    * fall back to sort-based merge per task — these keys' documented
    * stress semantics, which the spill/stress probes pin explicitly. The
    * shuffled volume is ~unchanged (singleton partial output ≈ raw rows);
    * what the lever removes is the wasted partial map + fallback sort +
    * wide-buffer row shuffle. Measured at sf0.1 (ScaleProbe `agglever`,
    * docs/agglever_probe.json): q2g 35.6 → 13.2 s median and q2f
    * 6.8 → 2.9 s with bit-identical fingerprints; q2e neutral. (A
    * sortWithinPartitions + replaceHashWithSortAgg streaming-sort-agg
    * variant was tried first: Catalyst's EliminateSorts removes a sort
    * below an aggregate, so that rule can never fire on this pattern.)
    */
  private def presorted(s: SparkSession, keyed: DataFrame,
      keys: Seq[org.apache.spark.sql.Column]): DataFrame =
    if (s.conf.get("spark.graft.q2.prepartition", "true").toBoolean) {
      // Partition-count sub-lever (r9 advice): at ~14.6M groups in one
      // 32-partition wave each q2g task hash-aggregates ~456k singleton
      // groups; doubling the count halves the per-task hash table while
      // keeping full occupancy (two short waves). Measured at the driver's
      // shape (local[32], sf0.1, ScaleProbe `aggparts`,
      // docs/aggparts_probe.json): 32→14.1 s, 64→12.4 s, 128→12.5 s,
      // 256→15.4 s, fingerprints identical — so the default is 2× the
      // session shuffle parallelism; `spark.graft.q2.prepartition.numparts`
      // overrides.
      val n = s.conf.get("spark.graft.q2.prepartition.numparts", "").trim
      val parts = if (n.nonEmpty) n.toInt
                  else 2 * s.conf.get("spark.sql.shuffle.partitions").toInt
      keyed.repartition(parts, keys: _*)
    } else keyed

  /** Second q2 lever (round 10): GROUP-KEY NARROWING. The declared group
    * key `line_key` is `concat(k1,'-',k2[,'-',k3])` over non-negative
    * integer fields — an INJECTIVE function of its inputs (the separator
    * makes the decimal renderings unambiguous), so grouping by the raw
    * integer columns produces exactly the same groups, and the string can
    * be synthesized ONCE PER GROUP after the aggregate instead of once per
    * input row before it. What that buys in the ≥10⁶-group regime: the
    * hash aggregate hashes/compares 8-byte longs instead of ~20-byte
    * UTF8Strings, the pre-aggregation shuffle rows carry the narrow
    * integer key instead of the string, and the concat runs once per
    * GROUP (14.6M at q2g/sf0.1) instead of once per input ROW (19.2M) —
    * and the string never enters the shuffle. This is precisely the rewrite an
    * injectivity-aware optimizer rule would derive from
    * `GROUP BY concat(a,'-',b)`; Catalyst has no such rule, so the lever
    * applies it at build time, conf-flagged like the prepartition lever:
    * `spark.graft.q2.intkeys` (default true; `false` restores the
    * string-keyed aggregate). Both shapes are fingerprint-identical —
    * ScaleProbe `intkeys` mode times and pins them
    * (docs/intkeys_probe.json), and Round10Spec asserts equality at
    * sf0.001 on every q2e/f/g key.
    */
  /** `amplify` > 1 marks the q2f/q2g in-plan replication: `raw` arrives
    * WITHOUT the `rep` column and the narrowed path explodes
    * `sequence(0, amplify-1)` AFTER the repartition — the replication
    * commutes with the exchange because hash(k1, k2) already co-locates
    * every (k1, k2, rep) replica, so the shuffle moves the natural rows
    * (600k at q2g/sf0.1) instead of the amplified stream (19.2M): 32×
    * less shuffle I/O feeding the SAME 14.6M-group aggregate — the
    * declared group-cardinality stress is untouched, only the transport
    * of identical replicas is. The string-keyed stress shape keeps the
    * explode above the exchange (the full re-keyed-shuffle pathology the
    * spill probes pin).
    */
  private def q2Grouped(s: SparkSession, raw: DataFrame,
      intKeys: Seq[String], lineKey: org.apache.spark.sql.Column,
      aggs: Seq[org.apache.spark.sql.Column], amplify: Int = 1): DataFrame = {
    def amplified(df: DataFrame): DataFrame =
      if (amplify > 1)
        df.withColumn("rep", explode(expr(s"sequence(0, ${amplify - 1})")))
      else df
    if (s.conf.get("spark.graft.q2.intkeys", "true").toBoolean) {
      val baseKeys = intKeys.filterNot(_ == "rep")
      amplified(presorted(s, raw, baseKeys.map(col)))
        .groupBy(intKeys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("line_key", lineKey)
    } else
      presorted(s, amplified(raw).withColumn("line_key", lineKey),
          Seq(col("line_key")))
        .groupBy(col("line_key"))
        .agg(aggs.head, aggs.tail: _*)
  }

  val q2eSql: String =
    """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS line_key,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |       COUNT(*) AS n_lines
      |FROM lineitem GROUP BY 1 ORDER BY line_key""".stripMargin

  /** Q2 sweep past the dataset's natural ceiling: q2e maxes out at the
    * ~457k distinct line keys the data offers, so this variant amplifies
    * IN-PLAN — each line explodes into 4 replica rows whose composite key
    * includes the replica index — giving ~1.8M groups at sf0.1 (2.4M rows)
    * without touching the fixtures. This is the first declared key to
    * cross 10⁶ groups, the regime upstream's 2.5×10⁸-group Q2c occupies
    * per-executor at 100 TB: partial maps are pure overhead, the final
    * agg is effectively a re-keyed shuffle of the whole input.
    */
  def q2f(s: SparkSession, d: String): DataFrame =
    q2Grouped(s, Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      amplify = 4,
      intKeys = Seq("l_orderkey", "l_linenumber", "rep"),
      lineKey = concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"), lit("-"),
        col("rep").cast("string")),
      aggs = Seq(
        sum(money(col("l_extendedprice"))).cast("double").as("total_price"),
        count(lit(1)).as("n_lines")))
      .select(col("line_key"), col("total_price"), col("n_lines"))
      .orderBy(col("line_key"))

  val q2fSql: String =
    """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
      |         || '-' || CAST(r.rep AS VARCHAR) AS line_key,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       COUNT(*) AS n_lines
      |FROM lineitem CROSS JOIN (SELECT unnest(range(4)) AS rep) r
      |GROUP BY 1 ORDER BY line_key""".stripMargin

  /** Q2 sweep terminus: the ≥10⁷-group regime (upstream Q2c's
    * `SUBSTR(sourceIP,1,12)` ≈ 2.5×10⁸ groups is this shape at its SF).
    * 32× in-plan amplification over q2e's natural keys → ~14.6M distinct
    * `line_key` groups at sf0.1 (19.2M input rows), every one materialized
    * by the inner aggregate. A row-per-group DECLARED result would make the
    * oracle compare 10⁷ rows (DuckDB-side cost, not Spark's), so the
    * declared output re-aggregates the groups into ~100 prefix buckets
    * carrying (a) the GROUP COUNT — the ≥10⁷ claim is self-evident from
    * `SUM(n_groups)` in the result itself, (b) exact-decimal money sums,
    * and (c) a deterministic per-group key checksum
    * (`SUM(graft_polyhash(line_key))`, replayed literally in DuckDB): a
    * single dropped, duplicated, or mis-keyed group anywhere in the 10⁷
    * shifts the checksum. Inner agg, two shapes via [[presorted]]: the
    * shipped default is the pre-partitioned single-stage agg (2.7× faster
    * at sf0.1, same shuffle count, bit-identical results —
    * docs/agglever_probe.json); `spark.graft.q2.prepartition=false`
    * restores the partial→final hash path whose 100%-singleton partial
    * maps fall back to sort-based merge per task — the per-executor
    * pathology of a 10⁸-group 100 TB run, which ScaleProbe `spill` mode
    * pins and runs under a capped heap, recording memoryBytesSpilled > 0
    * with unchanged results.
    */
  def q2g(s: SparkSession, d: String): DataFrame = {
    graft.functions.StringPolyHash.register(s)
    val groups = q2Grouped(s, Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      amplify = 32,
      intKeys = Seq("l_orderkey", "l_linenumber", "rep"),
      lineKey = concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"), lit("-"),
        col("rep").cast("string")),
      aggs = Seq(
        sum(money(col("l_extendedprice"))).as("price_dec"),
        count(lit(1)).as("n_lines")))
    groups
      .groupBy(substring(col("line_key"), 1, 2).as("bucket"))
      .agg(count(lit(1)).as("n_groups"),
           sum(col("n_lines")).as("n_lines_total"),
           sum(col("price_dec")).cast("double").as("total_price"),
           sum(expr("graft_polyhash(line_key)")).as("key_checksum"))
      // trivially-true HAVING, load-bearing on purpose: under a bare
      // count() action Catalyst (correctly) collapses the two-level agg —
      // bucket EXISTENCE doesn't need the 14.6M inner groups — and the
      // bench would time a plan that skips the whole point of this key.
      // Depending on n_groups forces the inner aggregate into every
      // action's plan. Semantics unchanged (every bucket has >= 1 group);
      // the oracle carries the same HAVING.
      .filter(col("n_groups") > 0)
      .orderBy(col("bucket"))
  }

  val q2gSql: String =
    """WITH g AS (
      |  SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
      |           || '-' || CAST(r.rep AS VARCHAR) AS line_key,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS price_dec,
      |         COUNT(*) AS n_lines
      |  FROM lineitem CROSS JOIN (SELECT unnest(range(32)) AS rep) r
      |  GROUP BY 1)
      |SELECT substr(line_key, 1, 2) AS bucket,
      |       COUNT(*) AS n_groups,
      |       CAST(SUM(n_lines) AS BIGINT) AS n_lines_total,
      |       CAST(SUM(price_dec) AS DOUBLE) AS total_price,
      |       CAST(SUM(list_reduce(list_transform(regexp_split_to_array(line_key, ''),
      |            c -> ascii(c)), (a, b) -> (a * 31 + b) % 1000003)) AS BIGINT) AS key_checksum
      |FROM g GROUP BY 1 HAVING COUNT(*) > 0 ORDER BY bucket""".stripMargin

  // ---- q2h: group-key narrowing via the OPTIMIZER RULE (declared naive) --

  /** q2e's shape DECLARED with the string concat group key — no build-time
    * lever — and planned by the flag-gated
    * [[graft.plans.NarrowGroupKeyRewrite]]: the rule proves the engine can
    * derive the q2 `intkeys` narrowing from the naive declaration, exactly
    * as j10 proves the range-join rewrite the j6 composition does by hand.
    * Distinct aggregate list from q2e (qty only) keeps the two keys'
    * outputs distinct. The oracle checks the REWRITTEN plan's results;
    * PlanRewriteSpec asserts the optimized plan actually lost the
    * concat-backed grouping. j10's flag scoping applies verbatim: the
    * flag-dependent plan is EXECUTED inside the scope (materialized to the
    * data-stamped scratch layout) so no other query ever sees the flag.
    */
  private[graft] def q2hRaw(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("line_key"))
      .agg(sum(money(col("l_quantity"))).cast("double").as("total_qty"),
           count(lit(1)).as("n_lines"))

  def q2hNarrowRule(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftPlanner.install(s)
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val path = s"${graft.Scratch.dir(s)}/graft_q2h_out_$tag"
    graft.sources.MultiFormat.ensureLayout(
      new java.io.File(s"$d/lineitem.parquet"), path) {
      val flag = graft.plans.NarrowGroupKeyRewrite.Flag
      val prev = s.conf.getOption(flag)
      s.conf.set(flag, "true")
      try q2hRaw(s, d).write.mode("overwrite").parquet(path)
      finally prev match {
        case Some(v) => s.conf.set(flag, v)
        case None    => s.conf.unset(flag)
      }
    }
    graft.Tables.cachedParquet(s, path).orderBy(col("line_key"))
  }

  val q2hSql: String =
    """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS line_key,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |       COUNT(*) AS n_lines
      |FROM lineitem GROUP BY 1 ORDER BY line_key""".stripMargin

  private def q2Sql(prefixLen: Int): String =
    s"""SELECT substr(o_orderpriority, 1, $prefixLen) AS prio_prefix,
       |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       |       COUNT(*) AS n_orders
       |FROM orders GROUP BY 1 ORDER BY prio_prefix""".stripMargin

  // ---- Q3: join + per-key agg + top-1 by revenue ----
  private def q3(dateHi: String)(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").between(lit("1995-01-01").cast("timestamp"),
                                         lit(dateHi).cast("timestamp")))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("total_revenue"),
           // avg as exact-decimal-sum / count: identical double both engines
           (sum(money(col("c_acctbal"))).cast("double") / count(lit(1)))
             .as("avg_acctbal"))
      .orderBy(col("total_revenue").desc, col("c_custkey"))
      .limit(1)
  }

  def q3a(s: SparkSession, d: String): DataFrame = q3("1995-07-01")(s, d)
  def q3b(s: SparkSession, d: String): DataFrame = q3("1997-01-01")(s, d)
  def q3c(s: SparkSession, d: String): DataFrame = q3("2002-01-01")(s, d)

  private def q3Sql(dateHi: String): String =
    s"""SELECT c_custkey,
       |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '$dateHi'
       |GROUP BY c_custkey
       |ORDER BY total_revenue DESC, c_custkey LIMIT 1""".stripMargin

  // ---- Q4: tokenize documents, count per token, top-20 ----
  def q4Wordcount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  val q4WordcountSql: String =
    """SELECT token, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** Q4's literal external-script TRANSFORM mechanism: upstream pipes rows
    * through `python url_count.py` via Hive TRANSFORM (amplab/benchmark
    * `runner/run_query.py` QUERY_4 + `runner/url_count.py`); the 1:1 Spark
    * shape is `RDD.pipe` — each partition feeds one external process over
    * stdin/stdout, the process boundary is real. The piped script is a
    * url_count.py-like tokenizer (split + emit one token per line); the
    * re-aggregation stays in Spark, so the oracle is the same wordcount SQL
    * as q4_wordcount. At 100 TB this runs one OS process per partition —
    * the same contract as Hive TRANSFORM, no driver involvement.
    *
    * Precondition (inherent to any line-oriented TRANSFORM, including the
    * reference's): document text must not contain newline/CR characters —
    * the pipe protocol is one row per line, so embedded newlines would
    * split a document into several rows and diverge from split(text, ' ').
    * The synthetic corpus is newline-free; real crawl data would be
    * escaped (e.g. base64 or \\n-escaping) at ingest, exactly as Hive
    * TRANSFORM pipelines do.
    */
  def q4Pipe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // replace()-based emit: C-speed inside the interpreter, identical token
    // stream to a split-and-print loop (empties between double spaces kept)
    val tokenizer =
      "import sys\n" +
      "w = sys.stdout.write\n" +
      "for line in sys.stdin:\n" +
      "    w(line.rstrip('\\n').replace(' ', '\\n'))\n" +
      "    w('\\n')\n"
    val tokens = Tables.documents(s, d)
      .select(col("text")).as[String]
      .rdd.pipe(Seq("python3", "-c", tokenizer))
    tokens.toDF("token")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
  }

  /** Q4's two-phase CTAS shape: partial counts per (source, token), then
    * re-aggregate per token. Declared as one chained plan for the oracle;
    * the materialized two-step variant lives in unit tests (sink path).
    */
  def q4Ctas(s: SparkSession, d: String): DataFrame = {
    val partial = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    partial
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("total_cnt"))
      .orderBy(col("token"))
  }

  val q4CtasSql: String =
    """SELECT token, CAST(SUM(cnt) AS BIGINT) AS total_cnt FROM (
      |  SELECT source, token, COUNT(*) AS cnt
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY source, token)
      |GROUP BY token ORDER BY token""".stripMargin


  /** Five-table star join (TPC-H Q5 flavor): region ⋈ nation ⋈ customer ⋈
    * orders ⋈ lineitem with per-(region, year) revenue. The two dims
    * broadcast; the two fact-fact joins shuffle on their keys; revenue uses
    * the decimal-exact + ROUND-before-double discipline.
    */
  def q5StarJoin(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_items"),
           round(sum(money(col("l_extendedprice")) * money6(lit(1) - col("l_discount"))), 2)
             .cast("double").as("revenue"))
      .orderBy(col("r_name"), col("yr"))
  }

  val q5Sql: String =
    """SELECT r_name, year(o_orderdate) AS yr, COUNT(*) AS n_items,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1, 2 ORDER BY r_name, yr""".stripMargin

  /** SQL-text parity: ONE ANSI string executed verbatim by BOTH engines —
    * `spark.sql` over GraftSession.registerTables views on the Spark side,
    * the identical string as its own DuckDB oracle. This is the reference's
    * actual usage mode (its queries are SQL strings over external tables):
    * proof the engine's SQL entry path is first-class, not a DataFrame-only
    * surface. The query is a dim-joined revenue rollup — broadcast-able
    * nation dim, keyed agg, decimal-exact money.
    */
  val sql1Text: String =
    """SELECT n_name, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  def sql1ViaSql(s: SparkSession, d: String): DataFrame = {
    graft.GraftSession.registerTables(s, d)
    s.sql(sql1Text)
  }

  /** sql2 family: the REFERENCE's own query families as verbatim ANSI
    * strings — one string per family, executed unchanged by `spark.sql`
    * over [[graft.GraftSession.registerTables]] views AND as its own DuckDB
    * oracle. sql1 proved the SQL entry path exists; these prove it spans
    * the actual benchmark surface (Q1 scan-filter, Q2 substr-agg, Q3
    * join-topk, and the star-join bonus family). Q4 is the one family with
    * no dialect-shared spelling — its tokenizer primitive is `explode(
    * split(...))` in Spark vs `unnest(string_split(...))` in DuckDB, with
    * no common table-function syntax between the engines — so its SQL-mode
    * parity is already carried by q4_wordcount's oracle (identical results
    * through the different spellings); the star join stands in as the
    * fourth VERBATIM string. The only texts that differ from the q*-key
    * oracles: sql2_q5 spells `CAST(year(..) AS BIGINT)` because Spark's
    * `year()` returns INT where DuckDB returns BIGINT — the cast makes the
    * one string schema-identical in both engines.
    */
  val sql2Q1Text: String = q1Sql("100000")
  val sql2Q2Text: String = q2Sql(1)
  val sql2Q3Text: String = q3Sql("1997-01-01")
  /** Q4 as SQL text — the one family member whose text form cannot reuse
    * the oracle string verbatim: token explosion is `explode(split(...))`
    * in Spark SQL but `unnest(string_split(...))` in DuckDB, so the Spark
    * text is spelled here and the shared oracle stays q4WordcountSql.
    */
  val sql2Q4Text: String =
    """SELECT token, COUNT(*) AS cnt
      |FROM (SELECT explode(split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** Q1 through PARAMETERIZED SQL — `spark.sql(text, args)` named-marker
    * binding, the injection-safe templating surface a SQL-first user
    * drives the engine with. The marker binds a typed literal at parse
    * time, so Catalyst sees the same constant-folded plan as the inlined
    * text (plan parity with q1a is pinned in Round10Spec); the oracle is
    * the inlined form.
    */
  def sql3ParamText(s: SparkSession, d: String): DataFrame = {
    graft.GraftSession.registerTables(s, d)
    s.sql(
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_extendedprice > :threshold
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      Map("threshold" -> 100000))
  }
  val sql2Q5Text: String =
    """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS yr, COUNT(*) AS n_items,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1, 2 ORDER BY r_name, yr""".stripMargin

  private def viaSql(text: String)(s: SparkSession, d: String): DataFrame = {
    graft.GraftSession.registerTables(s, d)
    s.sql(text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql1_text_parity" -> (sql1ViaSql _),
    "sql2_q1_text"     -> (viaSql(sql2Q1Text) _),
    "sql2_q2_text"     -> (viaSql(sql2Q2Text) _),
    "sql2_q3_text"     -> (viaSql(sql2Q3Text) _),
    "sql2_q4_text"     -> (viaSql(sql2Q4Text) _),
    "sql2_q5_text"     -> (viaSql(sql2Q5Text) _),
    "sql3_param_text"  -> (sql3ParamText _),
    "q2g_substr_agg"   -> (q2g _),
    "q2h_narrow_rule"  -> (q2hNarrowRule _),
    "q1a_scan_filter" -> (q1a _),
    "q1b_scan_filter" -> (q1b _),
    "q1c_scan_filter" -> (q1c _),
    "q2a_substr_agg"  -> (q2a _),
    "q2b_substr_agg"  -> (q2b _),
    "q2c_substr_agg"  -> (q2c _),
    "q2d_substr_agg"  -> (q2d _),
    "q2e_substr_agg"  -> (q2e _),
    "q2f_substr_agg"  -> (q2f _),
    "q3a_join_topk"   -> (q3a _),
    "q3b_join_topk"   -> (q3b _),
    "q3c_join_topk"   -> (q3c _),
    "q4_wordcount"    -> (q4Wordcount _),
    "q4_ctas"         -> (q4Ctas _),
    "q4_pipe"         -> (q4Pipe _),
    "q5_star_join"    -> (q5StarJoin _)
  )

  val oracles: Map[String, String] = Map(
    "q1a_scan_filter" -> q1Sql("100000"),
    "q1b_scan_filter" -> q1Sql("50000"),
    "q1c_scan_filter" -> q1Sql("10000"),
    "q2a_substr_agg"  -> q2Sql(1),
    "q2b_substr_agg"  -> q2Sql(3),
    "q2c_substr_agg"  -> q2cSql,
    "q2d_substr_agg"  -> q2dSql,
    "q2e_substr_agg"  -> q2eSql,
    "q2f_substr_agg"  -> q2fSql,
    "q2g_substr_agg"  -> q2gSql,
    "q2h_narrow_rule" -> q2hSql,
    "sql1_text_parity" -> sql1Text,
    "sql2_q1_text"    -> sql2Q1Text,
    "sql2_q2_text"    -> sql2Q2Text,
    "sql2_q3_text"    -> sql2Q3Text,
    "sql2_q4_text"    -> q4WordcountSql,
    "sql2_q5_text"    -> sql2Q5Text,
    "sql3_param_text" -> q1Sql("100000"),
    "q3a_join_topk"   -> q3Sql("1995-07-01"),
    "q3b_join_topk"   -> q3Sql("1997-01-01"),
    "q3c_join_topk"   -> q3Sql("2002-01-01"),
    "q4_wordcount"    -> q4WordcountSql,
    "q4_ctas"         -> q4CtasSql,
    "q4_pipe"         -> q4WordcountSql, // process boundary differs, result must not
    "q5_star_join"    -> q5Sql
  )
}
