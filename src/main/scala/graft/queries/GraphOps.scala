package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge lists — the corpus-curation
  * companion family to PipelineOps' connected components (x15): web
  * pipelines rank the domain/link graph and use the rank as a document
  * quality prior (the CommonCrawl harmonic-centrality ranking and the
  * original PageRank both serve exactly this role; the reference benchmark's
  * `rankings.pageRank` column is the OUTPUT of such a computation —
  * amplab/benchmark `runner/prepare_benchmark.py` loads it precomputed,
  * this operator computes it).
  *
  * Scale design (100 TB): each iteration is one join (edges × ranks, both
  * hash-partitioned on the same key) plus one keyed aggregation — the
  * classic distributed PageRank shape. Ranks move through the shuffle as
  * (node, long) pairs, never adjacency lists; edges are re-used across
  * iterations from one cached relation. Iteration count is fixed and small
  * (power iteration converges geometrically; 3 hops here keep the oracle's
  * chained-CTE replay tractable), so the unrolled logical plan stays
  * constant-size.
  *
  * Determinism: ranks are integer micro-units (1e6 = rank 1.0). Per-node
  * contribution is `rank div degree` and the damping update is
  * `0.15 + 0.85 * in_sum` in the same micro-units — all operands positive,
  * so truncating vs flooring integer division agree and both engines
  * produce bit-identical longs regardless of summation order.
  */
object GraphOps {

  private val Iters   = 3
  private val SuppOff = 10000000L // supplier node-id offset (> max partkey)

  /** Bipartite part↔supplier graph from lineitem's distinct
    * (l_partkey, l_suppkey) pairs, undirected (both edge directions).
    */
  private def edgeList(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val fwd = e0.select(col("l_partkey").as("src"),
      (col("l_suppkey") + SuppOff).as("dst"))
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  def x28Pagerank(s: SparkSession, d: String): DataFrame = {
    val edges = edgeList(s, d).persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var rank = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to Iters) {
      val contrib = rank.join(deg, rank("node") === deg("src"))
        .select(col("node"), expr("pr div deg").as("c"))
      val incoming = edges.join(contrib, edges("src") === contrib("node"))
        .groupBy(edges("dst")).agg(sum(col("c")).as("in_sum"))
      rank = deg.select(col("src").as("node"))
        .join(incoming, col("node") === col("dst"), "left")
        .select(col("node"),
          expr("150000L + (850L * coalesce(in_sum, 0L)) div 1000L").as("pr"))
    }
    val out = rank.orderBy(col("node"))
    graft.ScopedCache.releaseAfterNextAction(s, Seq(edges))
    out
  }

  val x28Sql: String = {
    val hops = (1 to Iters).map { i =>
      s"""i$i AS (
         |  SELECT e.dst AS node, SUM(r.pr // d.deg) AS in_sum
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
         |r$i AS (
         |  SELECT d.src AS node,
         |         CAST(150000 + (850 * COALESCE(i.in_sum, 0)) // 1000 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN i$i i ON i.node = d.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
       |edges AS (
       |  SELECT p AS src, s + $SuppOff AS dst FROM e0
       |  UNION ALL SELECT s + $SuppOff AS src, p AS dst FROM e0),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$hops
       |SELECT node, pr FROM r$Iters ORDER BY node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x28_pagerank" -> (x28Pagerank _)
  )

  val oracles: Map[String, String] = Map(
    "x28_pagerank" -> x28Sql
  )
}
