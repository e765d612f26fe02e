package graft.queries

import graft.Tables
import graft.functions.TokenizePos
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** User-extension surface: scalar UDF, typed UDAF (Aggregator), and the
  * custom Catalyst generator (UDTF) — the reference's only extension point
  * was Q4's external-script TRANSFORM; these are the three in-engine
  * equivalents, in preference order (built-in > Expression > UDF).
  */
object UserDefined {

  // ---- u1: scalar UDF (account-balance tier) ----
  // Kept deliberately trivial: UDFs are codegen-opaque, so the guidance is
  // "built-ins first" — this exists to cover the extension surface, and the
  // oracle mirrors it as a CASE expression.
  private val tierFn: Double => String = bal =>
    if (bal < 0) "neg" else if (bal < 5000) "mid" else "high"

  def u1Udf(s: SparkSession, d: String): DataFrame = {
    val tier = udf(tierFn)
    Tables.customer(s, d)
      .groupBy(tier(col("c_acctbal")).as("tier"))
      .agg(count(lit(1)).as("cnt"),
           sum(Tables.money(col("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy(col("tier"))
  }

  val u1Sql: String =
    """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
      |            WHEN c_acctbal < 5000 THEN 'mid'
      |            ELSE 'high' END AS tier,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer GROUP BY 1 ORDER BY tier""".stripMargin

  // ---- u2: typed Aggregator — exact weighted average ----
  // BigDecimal accumulation mirrors the engine-side money() discipline:
  // exact and associative, so partial aggregation across partitions is
  // deterministic. The double division happens once, at finish.
  object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {
    private def dec2(x: Double): JBigDecimal =
      new JBigDecimal(x).setScale(2, RoundingMode.HALF_UP)
    override def zero: (JBigDecimal, JBigDecimal) =
      (JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
      val (price, qty) = in
      val (num, den) = b
      val q = dec2(qty)
      (num.add(dec2(price).multiply(q)), den.add(q))
    }
    override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (a._1.add(b._1), a._2.add(b._2))
    override def finish(r: (JBigDecimal, JBigDecimal)): Double =
      if (r._2.signum == 0) Double.NaN
      // round the scale-4 numerator to scale 2 first: keeps its unscaled
      // value below 2^53 at any realistic SF so the double conversion is
      // exact in both engines (see the f4/f6 lesson)
      else r._1.setScale(2, RoundingMode.HALF_UP).doubleValue() / r._2.doubleValue()
    override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def u2Udaf(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WeightedAvg,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
           count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  val u2Sql: String =
    """SELECT l_returnflag,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
      |         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
      |       COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- u3: UDTF via the custom TokenizePos generator ----
  def u3Udtf(s: SparkSession, d: String): DataFrame = {
    TokenizePos.register(s)
    Tables.documents(s, d)
      .createOrReplaceTempView("graft_docs_u3")
    s.sql(
      """SELECT lang, token, pos FROM (
        |  SELECT lang, tokenize_pos(text) AS (pos, token) FROM graft_docs_u3)
        |""".stripMargin)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
           countDistinct(col("token")).as("n_distinct_tokens"),
           max(col("pos")).cast("long").as("max_pos"))
      .orderBy(col("lang"))
  }

  val u3Sql: String =
    """SELECT lang, COUNT(*) AS n_tokens,
      |       COUNT(DISTINCT token) AS n_distinct_tokens,
      |       MAX(pos) AS max_pos
      |FROM (SELECT lang,
      |             unnest(string_split(text, ' ')) AS token,
      |             unnest(range(len(string_split(text, ' ')))) AS pos
      |      FROM documents)
      |WHERE token <> '' GROUP BY lang ORDER BY lang""".stripMargin

  // ---- u4: TypedImperativeAggregate — heavy hitters per language ----
  // capacity (64) > vocabulary size, so the space-saving sketch degenerates
  // to exact counts and the top-3 is oracle-checkable.
  def u4HeavyHitters(s: SparkSession, d: String): DataFrame = {
    graft.functions.TopKTokensAgg.register(s)
    Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("lang"))
      .agg(expr("graft_topk_tokens(token)").as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "tc")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("tc.token").as("token"), col("tc.cnt").as("cnt"))
      .orderBy(col("lang"), col("rk"))
  }

  val u4Sql: String =
    """SELECT lang, rk, token, cnt FROM (
      |  SELECT lang, token, cnt,
      |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk
      |  FROM (
      |    SELECT lang, token, COUNT(*) AS cnt
      |    FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
      |    WHERE token <> '' GROUP BY lang, token))
      |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin

  // ---- u5: DeclarativeAggregate — codegen'd exact weighted sum ----
  // discounted revenue Σ(price · (1-disc)) per linestatus, via the
  // pure-expression aggregate (stays inside WholeStageCodegen)
  def u5DeclAgg(s: SparkSession, d: String): DataFrame = {
    graft.functions.WeightedSum.register(s)
    Tables.lineitem(s, d)
      .withColumn("disc_factor", lit(1) - col("l_discount"))
      .groupBy(col("l_linestatus"))
      // ROUND to scale 2 before the double cast (2^53 discipline, see f4)
      .agg(round(expr("graft_weighted_sum(l_extendedprice, disc_factor)"), 2)
             .cast("double").as("disc_revenue"),
           count(lit(1)).as("cnt"))
      .orderBy(col("l_linestatus"))
  }

  val u5Sql: String =
    """SELECT l_linestatus,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS disc_revenue,
      |       COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ---- u6: typed Dataset API — groupByKey + flatMapGroups --------------

  /** The typed-Dataset extension mechanism: `KeyValueGroupedDataset
    * .flatMapGroups` with case-class/tuple Encoders — per-user session
    * statistics (30-min gap rule) computed by arbitrary JVM logic over
    * each user's event group, the escape hatch for per-group algorithms
    * Spark SQL cannot express (u1–u5 cover scalar/agg/table functions;
    * this is the whole-group form, the batch twin of streaming
    * transformWithState).
    *
    * Scale honesty: one user-keyed exchange (object serdes, NOT
    * Tungsten — the declared cost of leaving SQL), then each group is
    * sorted in executor memory, so state is bounded by max events per
    * user — fine for per-user interaction streams (10²–10⁴), and the
    * window-function formulation (the oracle's own shape, s3/x57's path)
    * is the fallback when a single key's history cannot fit. Output is
    * integer-exact: session count via gap>30 min splits, max gap in
    * whole seconds of the microsecond timeline.
    */
  def u6TypedSessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts)").as("t_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long)]) =>
        val ts = it.map(_._2).toArray
        java.util.Arrays.sort(ts)
        var sessions = 1L
        var maxGap = 0L
        var i = 1
        while (i < ts.length) {
          val gap = ts(i) - ts(i - 1)
          if (gap > 1800L * 1000000L) sessions += 1
          if (gap > maxGap) maxGap = gap
          i += 1
        }
        Iterator((uid, ts.length.toLong, sessions, maxGap / 1000000L))
      }
      .toDF("user_id", "n_events", "n_sessions", "max_gap_s")
      .orderBy(col("user_id"))
  }

  val u6Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t_us FROM events),
      |g AS (SELECT user_id, t_us,
      |        t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
      |          AS gap
      |      FROM e)
      |SELECT user_id, COUNT(*) AS n_events,
      |       CAST(1 + SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_sessions,
      |       CAST(COALESCE(MAX(gap), 0) // 1000000 AS BIGINT) AS max_gap_s
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_udf"  -> (u1Udf _),
    "u2_udaf" -> (u2Udaf _),
    "u3_udtf" -> (u3Udtf _),
    "u4_heavy_hitters" -> (u4HeavyHitters _),
    "u5_decl_agg" -> (u5DeclAgg _),
    "u6_typed_sessions" -> (u6TypedSessions _)
  )

  val oracles: Map[String, String] = Map(
    "u1_udf"  -> u1Sql,
    "u2_udaf" -> u2Sql,
    "u3_udtf" -> u3Sql,
    "u4_heavy_hitters" -> u4Sql,
    "u5_decl_agg" -> u5Sql,
    "u6_typed_sessions" -> u6Sql
  )
}
