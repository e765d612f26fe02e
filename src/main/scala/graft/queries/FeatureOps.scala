package graft.queries

import graft.Tables
import graft.functions.StringPolyHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering operators (fe1–fe3): the tabular/feature-prep layer
  * of a training pipeline — per-group min-max scaling, smoothed target
  * encoding, and hashing-trick feature buckets. Every statistic is
  * integer-exact (micro-units, integer floor division, replayed
  * polyhash), so the features a 1000-executor run produces are
  * bit-identical to the oracle's.
  *
  * Scale design:
  *  - fe1 joins the 5-row per-group bounds back by BROADCAST, scales
  *    row-wise, and reduces to a decile histogram — two group-sized
  *    aggregates, one data-sized pass, no global sort;
  *  - fe2's global prior comes from an unpartitioned window over the
  *    ALREADY-AGGREGATED per-category rows (cardinality = category
  *    domain), never a 1-row cross join against the data;
  *  - fe3 is explode → one bucket-keyed aggregate whose output is capped
  *    by the bucket count (64), with map-side partial aggregation doing
  *    the heavy reduction.
  */
object FeatureOps {

  // ---- fe1: per-group min-max scaling, validated as a decile histogram --

  /** Min-max scaling of `events.value` per event_type, reported as the
    * per-type decile histogram of the scaled feature (counts + exact
    * scaled-ppm checksums) — the validation artifact a feature pipeline
    * stores next to the scaler. All arithmetic is integer: value in
    * micro-units, scaled position in ppm via floor division.
    */
  def fe1ScaleHistogram(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("ppm", expr("((v - vmin) * 1000000) div (vmax - vmin)"))
      .withColumn("decile", least(expr("ppm div 100000"), lit(9L)))
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("ppm")).as("sum_ppm"))
      .orderBy(col("event_type"), col("decile"))
  }

  val fe1Sql: String =
    """WITH ev AS (SELECT event_type,
      |              CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
      |b AS (SELECT event_type, MIN(v) AS vmin, MAX(v) AS vmax
      |      FROM ev GROUP BY event_type),
      |scaled AS (
      |  SELECT ev.event_type,
      |         ((v - vmin) * 1000000) // (vmax - vmin) AS ppm
      |  FROM ev JOIN b USING (event_type))
      |SELECT event_type, LEAST(ppm // 100000, 9) AS decile,
      |       COUNT(*) AS n, CAST(SUM(ppm) AS BIGINT) AS sum_ppm
      |FROM scaled GROUP BY event_type, LEAST(ppm // 100000, 9)
      |ORDER BY event_type, decile""".stripMargin

  // ---- fe2: smoothed (Bayesian) target encoding ----

  /** Target encoding of event_type against `value` with additive
    * smoothing toward the global mean: enc = (Σ_cat + m·μ_global) /
    * (n_cat + m), m = 25 — the standard leak-resistant categorical
    * encoder. Exact integer form: micro-unit sums, the global mean as
    * one floor division, the encoding as another; the global prior is
    * computed by a window over the per-category aggregate rows (category-
    * domain-sized), so no 1-row broadcast join touches the data path.
    */
  def fe2TargetEncode(s: SparkSession, d: String): DataFrame = {
    val perCat = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
    perCat
      .withColumn("gmean", expr("sum(sum_v) OVER () div sum(n) OVER ()"))
      .select(col("event_type"), col("n"),
        expr("(sum_v + 25 * gmean) div (n + 25)").as("enc_micros"))
      .orderBy(col("event_type"))
  }

  val fe2Sql: String =
    """WITH c AS (SELECT event_type, COUNT(*) AS n,
      |             CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
      |               AS sum_v
      |           FROM events GROUP BY event_type),
      |g AS (SELECT *, CAST(SUM(sum_v) OVER () AS BIGINT)
      |               // CAST(SUM(n) OVER () AS BIGINT) AS gmean FROM c)
      |SELECT event_type, n,
      |       CAST((sum_v + 25 * gmean) // (n + 25) AS BIGINT) AS enc_micros
      |FROM g ORDER BY event_type""".stripMargin

  // ---- fe3: hashing-trick feature buckets ----

  /** The hashing trick over document tokens: each token lands in one of
    * 64 buckets by polyhash, contributing a ±1 signed count (the
    * sign-bit variant that keeps collisions unbiased). Output is the
    * corpus-level bucket profile — 64 rows regardless of corpus size,
    * with map-side partial aggregation absorbing the token stream. The
    * oracle replays the byte-fold hash literally (x27's idiom).
    */
  def fe3FeatureHash(s: SparkSession, d: String): DataFrame = {
    StringPolyHash.register(s)
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .select(expr("graft_polyhash(tok)").as("h"))
      .select(expr("(h div 2) % 64").as("bucket"),
        expr("CASE WHEN h % 2 = 0 THEN 1L ELSE -1L END").as("sign"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("sign")).as("net_sign"))
      .orderBy(col("bucket"))
  }

  val fe3Sql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |h AS (
      |  SELECT list_reduce(list_transform(regexp_split_to_array(tok, ''),
      |           c -> ascii(c)), (a, b) -> (a * 31 + b) % 1000003) AS h
      |  FROM tok WHERE len(tok) >= 1)
      |SELECT (h // 2) % 64 AS bucket, COUNT(*) AS n_tokens,
      |       CAST(SUM(CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
      |         AS net_sign
      |FROM h GROUP BY (h // 2) % 64
      |ORDER BY bucket""".stripMargin

  // ---- fe4: deterministic cross-validation folds + stratification audit --

  /** Hash-based k-fold assignment (k=5) with the stratification-balance
    * audit a training pipeline stores next to the split: every doc lands
    * in fold `knuth(doc_id) % 5` — a STATELESS, content-independent
    * function of the stable id, so the assignment needs no shuffle, no
    * RNG state, and reproduces bit-identically on any cluster shape (the
    * q2d Knuth multiplicative hash; doc_id ≤ ~10⁷ keeps the product well
    * under 2⁶³ in both engines). The declared output is the audit, not
    * the assignment: per (lang, fold) doc counts, char totals, and each
    * fold's integer-ppm share WITHIN its language — imbalance across
    * folds inside a stratum is exactly what invalidates CV estimates.
    * Output cardinality is 5 × |langs| regardless of corpus size; the
    * per-lang total comes from a window over the already-aggregated rows
    * (fe2's no-cross-join idiom).
    */
  def fe4CrossvalFolds(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        ((col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(5L))
          .as("fold"))
      .groupBy(col("lang"), col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .withColumn("share_ppm", expr(
        "n_docs * 1000000L div SUM(n_docs) OVER (PARTITION BY lang)"))
      .orderBy(col("lang"), col("fold"))

  val fe4Sql: String =
    """WITH f AS (
      |  SELECT lang, n_chars,
      |         (doc_id * 2654435761) % 1000000007 % 5 AS fold
      |  FROM documents),
      |g AS (SELECT lang, fold, COUNT(*) AS n_docs,
      |        CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
      |      FROM f GROUP BY lang, fold)
      |SELECT lang, fold, n_docs, n_chars_total,
      |       CAST(n_docs * 1000000 // SUM(n_docs) OVER (PARTITION BY lang)
      |         AS BIGINT) AS share_ppm
      |FROM g ORDER BY lang, fold""".stripMargin

  // ---- fe5: contingency lift (feature-association audit) ---------------

  /** Observed-vs-expected lift table between the binned event value and
    * the event type — the exact-integer core of the chi²/mutual-information
    * feature-selection audit (lift_ppm = P(x,y)/(P(x)·P(y)) in ppm; MI and
    * χ² are monotone post-processings of exactly these cells, but their
    * logs/squares leave integer arithmetic, so the DECLARED output is the
    * cell table both derive from).
    *
    * Scale design: ONE data-sized aggregation to the (bucket × type) cell
    * table (map-side partials absorb the stream), then marginals via
    * windows over the ≤ 12×|types| AGGREGATED rows — domain-sized, never a
    * second data pass. Integer headroom: the n·10⁶·N product needs < 2⁶³,
    * which holds to N ≈ 3·10⁶ rows; past that widen the ppm product to
    * DECIMAL(38,0) on both engines (ordering unchanged).
    */
  def fe5FeatureLift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, d)
      .select(expr("width_bucket(value, 0.0D, 500.0D, 10)").as("vbucket"),
        col("event_type"))
      .groupBy(col("vbucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("rn", sum(col("n")).over(Window.partitionBy(col("vbucket"))))
      .withColumn("cn", sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .withColumn("nt", sum(col("n")).over(Window.partitionBy()))
      .select(col("vbucket"), col("event_type"), col("n"), col("rn"),
        col("cn"), expr("n * 1000000L * nt div (rn * cn)").as("lift_ppm"))
      .orderBy(col("vbucket"), col("event_type"))
  }

  val fe5Sql: String =
    """WITH b AS (
      |  SELECT LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS BIGINT) + 1, 0),
      |               11) AS vbucket,
      |         event_type
      |  FROM events),
      |cells AS (SELECT vbucket, event_type, COUNT(*) AS n
      |          FROM b GROUP BY vbucket, event_type),
      |m AS (SELECT vbucket, event_type, n,
      |        CAST(SUM(n) OVER (PARTITION BY vbucket) AS BIGINT) AS rn,
      |        CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS cn,
      |        CAST(SUM(n) OVER () AS BIGINT) AS nt
      |      FROM cells)
      |SELECT vbucket, event_type, n, rn, cn,
      |       CAST(n * 1000000 * nt // (rn * cn) AS BIGINT) AS lift_ppm
      |FROM m ORDER BY vbucket, event_type""".stripMargin

  // ---- fe6: sequence-length bucketing / padding-waste audit ------------

  /** Length-bucketed batching audit: documents grouped into 16-token
    * length buckets (the dynamic-batching strategy of every sequence
    * trainer), reporting per bucket the padding waste ppm at the bucket
    * boundary vs the waste of padding the whole corpus to its max length.
    * This is the table that justifies (and sizes) length-bucketed
    * batching on a real corpus.
    *
    * Scale design: one scan → one tiny keyed aggregate (output rows =
    * length-domain / 16, a constant); the corpus-max comparison is a
    * window over those few AGGREGATED rows. Wordcount-shaped at any
    * corpus size.
    */
  def fe6LengthBuckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .select(expr("(n_tok + 15) div 16").as("bucket"), col("n_tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok_sum"))
      .withColumn("corpus_max",
        max(col("bucket") * 16L).over(Window.partitionBy()))
      .select(col("bucket"), col("n_docs"), col("n_tok_sum"),
        expr("(n_docs * bucket * 16 - n_tok_sum) * 1000000 " +
          "div (n_docs * bucket * 16)").as("pad_waste_ppm"),
        expr("(n_docs * corpus_max - n_tok_sum) * 1000000 " +
          "div (n_docs * corpus_max)").as("global_waste_ppm"))
      .orderBy(col("bucket"))
  }

  val fe6Sql: String =
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |g AS (SELECT (n_tok + 15) // 16 AS bucket, COUNT(*) AS n_docs,
      |        CAST(SUM(n_tok) AS BIGINT) AS n_tok_sum
      |      FROM t GROUP BY 1),
      |w AS (SELECT *, CAST(MAX(bucket * 16) OVER () AS BIGINT) AS corpus_max
      |      FROM g)
      |SELECT bucket, n_docs, n_tok_sum,
      |       CAST((n_docs * bucket * 16 - n_tok_sum) * 1000000
      |         // (n_docs * bucket * 16) AS BIGINT) AS pad_waste_ppm,
      |       CAST((n_docs * corpus_max - n_tok_sum) * 1000000
      |         // (n_docs * corpus_max) AS BIGINT) AS global_waste_ppm
      |FROM w ORDER BY bucket""".stripMargin

  // ---- fe7: exact-integer covariance / Gram matrix ----------------------

  /** The covariance (and Gram) matrix over the first 8 embedding
    * dimensions — the statistic PCA, whitening, and feature-correlation
    * pruning all consume. Exact integers end-to-end: coordinates in
    * milli-units (round-half-up, x37's idiom), and the DECLARED cells are
    * n, Σxᵢ, Σxⱼ, Σxᵢxⱼ plus the centered numerator n·Σxᵢxⱼ − Σxᵢ·Σxⱼ
    * (= n²·cov); the float covariance is one division away, so both
    * engines agree bit-for-bit on everything that matters.
    *
    * 100 TB shape: pair enumeration happens IN-ROW (nested transform over
    * the 36 (i ≤ j) pairs — no self-join), and the only shuffle is one
    * (i,j)-keyed aggregation whose output is 36 rows at any corpus size,
    * with map-side partials absorbing the data. Integer headroom: milli²
    * sums carry to ~10⁴ vectors per 2⁴⁰, so n·Σxᵢxⱼ stays under 2⁶³ to
    * ~10⁷ rows; past that widen the two product cells to DECIMAL(38,0) on
    * both engines (fe5's documented lever).
    */
  def fe7Covariance(s: SparkSession, d: String): DataFrame = {
    val dims = 8
    Tables.embeddings(s, d)
      .select(expr(
        s"transform(slice(embedding, 1, $dims), " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS LONG))").as("m"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $dims), i ->
           |  transform(sequence(i, $dims), j ->
           |    struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           |           element_at(m, i) AS xi, element_at(m, j) AS xj))))"""
          .stripMargin)).as("p"))
      .select(col("p.i"), col("p.j"), col("p.xi"), col("p.xj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sum_i"),
        sum(col("xj")).as("sum_j"),
        sum(col("xi") * col("xj")).as("sum_ij"))
      .withColumn("cov_num", col("n") * col("sum_ij") - col("sum_i") * col("sum_j"))
      .orderBy(col("i"), col("j"))
  }

  val fe7Sql: String =
    """WITH m AS (
      |  SELECT vec_id,
      |         generate_subscripts(embedding[1:8], 1) AS i,
      |         CAST(floor(unnest(embedding[1:8]::DOUBLE[]) * 1000 + 0.5)
      |           AS BIGINT) AS xm
      |  FROM embeddings),
      |p AS (SELECT a.i AS i, b.i AS j, a.xm AS xi, b.xm AS xj
      |      FROM m a JOIN m b ON a.vec_id = b.vec_id AND b.i >= a.i)
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, COUNT(*) AS n,
      |       CAST(SUM(xi) AS BIGINT) AS sum_i,
      |       CAST(SUM(xj) AS BIGINT) AS sum_j,
      |       CAST(SUM(xi * xj) AS BIGINT) AS sum_ij,
      |       COUNT(*) * CAST(SUM(xi * xj) AS BIGINT)
      |         - CAST(SUM(xi) AS BIGINT) * CAST(SUM(xj) AS BIGINT) AS cov_num
      |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin

  // ---- fe8: supervised lag-feature assembly on the regular grid ---------

  /** Forecasting feature rows built on w8's regular hourly grid: per
    * (event_type, hour) the LOCF value plus its 1 h / 2 h / 24 h lags and
    * the NEXT hour's event count as the supervised target — the exact
    * table a demand-forecast trainer consumes, and the reason w8 creates
    * missing grid rows in the first place (lag columns must step over
    * empty hours, not skip them). Boundary rows keep their nulls: a
    * feature store materializes them and lets the trainer mask, because
    * silently dropping boundary hours shifts every fold boundary.
    *
    * 100 TB shape: w8's one data-sized aggregate, then THREE lags + one
    * lead riding a single per-type window over the domain-sized grid —
    * no new data pass, no new exchange beyond w8's.
    */
  def fe8LagFeatures(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr_ms"))
    graft.queries.WindowOps.w8ResampleGrid(s, d)
      .select(col("event_type"), col("hr_ms"), col("n_events"),
        col("vm_locf"),
        lag(col("vm_locf"), 1).over(w).as("vm_lag_1h"),
        lag(col("vm_locf"), 2).over(w).as("vm_lag_2h"),
        lag(col("vm_locf"), 24).over(w).as("vm_lag_24h"),
        lead(col("n_events"), 1).over(w).as("target_next_n"))
      .orderBy(col("event_type"), col("hr_ms"))
  }

  val fe8Sql: String = {
    val grid = graft.queries.WindowOps.w8Sql.replace("\n", "\n|  ")
    s"""WITH g AS (
       |  ${grid})
       |SELECT event_type, hr_ms, n_events, vm_locf,
       |       LAG(vm_locf, 1) OVER w AS vm_lag_1h,
       |       LAG(vm_locf, 2) OVER w AS vm_lag_2h,
       |       LAG(vm_locf, 24) OVER w AS vm_lag_24h,
       |       LEAD(n_events, 1) OVER w AS target_next_n
       |FROM g
       |WINDOW w AS (PARTITION BY event_type ORDER BY hr_ms)
       |ORDER BY event_type, hr_ms""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fe8_lag_features"    -> (fe8LagFeatures _),
    "fe7_covariance"      -> (fe7Covariance _),
    "fe1_scale_histogram" -> (fe1ScaleHistogram _),
    "fe2_target_encode"   -> (fe2TargetEncode _),
    "fe3_feature_hash"    -> (fe3FeatureHash _),
    "fe4_crossval_folds"  -> (fe4CrossvalFolds _),
    "fe5_feature_lift"    -> (fe5FeatureLift _),
    "fe6_length_buckets"  -> (fe6LengthBuckets _)
  )

  val oracles: Map[String, String] = Map(
    "fe8_lag_features"    -> fe8Sql,
    "fe7_covariance"      -> fe7Sql,
    "fe1_scale_histogram" -> fe1Sql,
    "fe2_target_encode"   -> fe2Sql,
    "fe3_feature_hash"    -> fe3Sql,
    "fe4_crossval_folds"  -> fe4Sql,
    "fe5_feature_lift"    -> fe5Sql,
    "fe6_length_buckets"  -> fe6Sql
  )
}
