package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every declared operator key to a DataFrame builder; each
  * keyed query has a matching DuckDB oracle in `oracleSql` unless the
  * semantics are not SQL-expressible (approx sketches, streaming state).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3b_join_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ RelationalOps.queries ++
      WindowOps.queries ++ UserDefined.queries ++ PipelineOps.queries ++
      CorpusOps.queries ++ GraphOps.queries ++ EventAnalytics.queries ++
      QualityOps.queries ++ FeatureOps.queries ++
      graft.sources.MultiFormat.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ RelationalOps.oracles ++
      WindowOps.oracles ++ UserDefined.oracles ++ PipelineOps.oracles ++
      CorpusOps.oracles ++ GraphOps.oracles ++ EventAnalytics.oracles ++
      QualityOps.oracles ++ FeatureOps.oracles ++
      graft.sources.MultiFormat.oracles
}
