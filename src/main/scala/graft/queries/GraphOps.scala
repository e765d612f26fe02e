package graft.queries

import graft.Tables
import graft.functions.SortedIntersectCount
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

  // ===== x64: triangle counting with degree orientation ===================

  /** Triangle count over the part co-purchase graph (parts sharing an
    * order), the clustering-coefficient / community-density primitive of
    * graph-quality scoring (a link-graph whose triangle density collapses
    * is a spam signal; the same wedge-closure join is the first hop of
    * motif mining).
    *
    * Scale design (100 TB): the classic degree-orientation bound. Edges
    * are oriented from the (degree, node)-smaller endpoint to the larger,
    * which turns the undirected graph into a DAG whose max out-degree is
    * O(√m); wedge enumeration (the only super-linear step) then costs
    * O(m^1.5) TOTAL and — crucially — no single node's wedge set depends
    * on its raw degree, so a celebrity node with 10⁸ neighbours
    * contributes no skewed join group. Every step is an equi-join or
    * keyed aggregation: per-order pair enumeration is bounded by the
    * order's line count (≤7 in TPC-H-shaped data), orientation is two
    * hash joins against the degree table, and closure is one equi-join of
    * wedges against oriented edges on the (v, w) pair. No step
    * materializes adjacency lists.
    *
    * Rank injectivity: rank = deg·2³² + node fits a long for any graph
    * with < 2³¹ nodes and total order (deg, node) — ties on degree break
    * on node id, so orientation is deterministic on both engines.
    *
    * Output: one row (n_edges, n_wedges, n_triangles) — global exact
    * integers; n_wedges is the oriented wedge count, i.e. the actual work
    * the closure join performed, so the row doubles as a plan-cost audit.
    */
  /** Part co-purchase edges: (a, b), a < b, for parts sharing an order —
    * kept only at SUPPORT ≥ 2 (co-occurring in at least two distinct
    * orders). Pair enumeration is bounded by the order's line count (≤ 7
    * in TPC-H-shaped data), so the self-join per order key never blows
    * up; the support threshold is the frequent-itemset discipline every
    * real co-purchase graph applies AND the scale lever that matters — a
    * random pairing of n items over m baskets produces Θ(m) noise pairs
    * that appear exactly once, and dropping them shrinks the edge set by
    * ~40× at sf0.1 (9.2M raw pairs → 230k supported edges) BEFORE any
    * super-linear graph work runs. One (a,b)-keyed count with map-side
    * partials does the filtering.
    */
  private def coPurchaseEdgesRaw(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    op.as("x").join(op.as("y"),
        col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 2)
      .select(col("a"), col("b"))
  }

  /** Compute-once/consume-many supported edge list (x15SharedLabels'
    * publish discipline): x64 and x67 both consume exactly this graph, and
    * the per-order pairing + support count is the dominant cost of each —
    * a production pipeline publishes the co-purchase graph once per corpus
    * snapshot and every graph job reads it. Stamped against the lineitem
    * data files, so a testdata regeneration rebuilds it; both keys' oracles
    * still recompute the edges from scratch, so the layout is continuously
    * value-checked, never trusted.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val path = s"${graft.Scratch.checkpointDir(s)}/graft_copurchase_$tag"
    graft.sources.MultiFormat.ensureLayout(
      new java.io.File(s"$d/lineitem.parquet"), path) {
      coPurchaseEdgesRaw(s, d).write.mode("overwrite").parquet(path)
    }
    graft.Tables.cachedParquet(s, path)
  }

  private val coPurchaseEdgesSql: String =
    """op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
      |       FROM lineitem),
      |edges AS (
      |  SELECT x.p AS a, y.p AS b
      |  FROM op x JOIN op y ON x.ok = y.ok AND x.p < y.p
      |  GROUP BY x.p, y.p HAVING COUNT(*) >= 2)""".stripMargin

  def x64TriangleCount(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d).persist()
    graft.ScopedCache.releaseAfterNextAction(s, Seq(edges))
    val deg = edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .select(col("node"), (col("deg") * 4294967296L + col("node")).as("rank"))
    val ranked = edges
      .join(deg.select(col("node").as("a"), col("rank").as("ra")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("rank").as("rb")), Seq("b"))
    val oriented = ranked.select(
      when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("src"),
      when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("dst"),
      when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rdst"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.rdst") < col("e2.rdst"))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    val closed = wedges.join(
        oriented.select(col("src").as("v"), col("dst").as("w"),
          lit(1L).as("hit")),
        Seq("v", "w"), "left")
      .agg(count(lit(1)).as("n_wedges"),
           sum(coalesce(col("hit"), lit(0L))).as("n_triangles"))
    edges.agg(count(lit(1)).as("n_edges")).crossJoin(closed)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"))
  }

  val x64Sql: String =
    s"""WITH $coPurchaseEdgesSql,
      |deg AS (
      |  SELECT node, COUNT(*) * 4294967296 + node AS rank FROM (
      |    SELECT a AS node FROM edges
      |    UNION ALL SELECT b AS node FROM edges) GROUP BY node),
      |oriented AS (
      |  SELECT CASE WHEN da.rank < db.rank THEN e.a ELSE e.b END AS src,
      |         CASE WHEN da.rank < db.rank THEN e.b ELSE e.a END AS dst,
      |         CASE WHEN da.rank < db.rank THEN db.rank
      |              ELSE da.rank END AS rdst
      |  FROM edges e
      |  JOIN deg da ON da.node = e.a
      |  JOIN deg db ON db.node = e.b),
      |wedges AS (
      |  SELECT e1.dst AS v, e2.dst AS w
      |  FROM oriented e1 JOIN oriented e2
      |    ON e1.src = e2.src AND e1.rdst < e2.rdst),
      |closed AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges,
      |         CAST(SUM(CASE WHEN o.src IS NOT NULL THEN 1 ELSE 0 END)
      |           AS BIGINT) AS n_triangles
      |  FROM wedges wg LEFT JOIN oriented o
      |    ON o.src = wg.v AND o.dst = wg.w)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
      |       n_wedges, n_triangles
      |FROM closed""".stripMargin

  // ===== x67: label-propagation communities (mode update) =================

  /** Synchronous label propagation — community detection by iterated
    * neighbourhood-majority vote (the curation use: community = topical /
    * domain cluster in the co-purchase or link graph, a grouping key for
    * mixture balancing that connected components (x15's min-label loop)
    * cannot produce, because CC merges everything reachable while LPA
    * stops at dense boundaries).
    *
    * Determinism: classic LPA breaks count-ties randomly; here the update
    * is the TOTAL order (count DESC, label ASC) — mode with min-label
    * tie-break — and all nodes update synchronously from the previous
    * round's labels, so every round is a pure function of the last and
    * both engines converge identically. Iteration count fixed at 3
    * (geometric stabilization; keeps the oracle's unrolled CTE chain
    * tractable).
    *
    * Scale design (100 TB): per round ONE edges×labels equi-join (both
    * sides hash-partitioned on node), then a (node, label)-keyed count and
    * a node-keyed argmax via `max(struct(cnt, -label))` — an AGGREGATE,
    * not a per-node sort, and a celebrity node's neighbourhood splits
    * across (node, label) groups, so no single reducer sees its whole
    * adjacency. Labels travel as (node, long) pairs; adjacency lists are
    * never materialized.
    */
  private val LpaIters = 3

  def x67LpaCommunities(s: SparkSession, d: String): DataFrame = {
    val e = coPurchaseEdges(s, d)
    val und = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    graft.ScopedCache.releaseAfterNextAction(s, Seq(und))
    var lab = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to LpaIters) {
      val hist = und.join(lab, und("dst") === lab("node"))
        .groupBy(und("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      lab = hist
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("src").as("node"), (-col("m.nl")).as("label"))
    }
    // declared output: the community-size histogram (community-domain-
    // sized; the per-node assignment stays distributed and is never
    // collected — a pipeline joins `lab` by node where it needs it)
    lab.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label"))
  }

  val x67Sql: String = {
    val rounds = (1 to LpaIters).map { i =>
      s"""h$i AS (
         |  SELECT e.src, l.label, COUNT(*) AS cnt
         |  FROM und e JOIN l${i - 1} l ON l.node = e.dst
         |  GROUP BY e.src, l.label),
         |l$i AS (
         |  SELECT src AS node, label FROM (
         |    SELECT src, label,
         |           ROW_NUMBER() OVER (PARTITION BY src
         |                              ORDER BY cnt DESC, label ASC) AS rk
         |    FROM h$i) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coPurchaseEdgesSql,
       |und AS (
       |  SELECT a AS src, b AS dst FROM edges
       |  UNION ALL SELECT b AS src, a AS dst FROM edges),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
       |$rounds
       |SELECT label, COUNT(*) AS n_members
       |FROM l$LpaIters
       |GROUP BY label ORDER BY n_members DESC, label""".stripMargin
  }

  // ===== x73: k-core peel (bounded rounds) =================================

  /** k-core decomposition by iterative peeling — the graph-density
    * primitive between x64's triangle count (local density) and x67's
    * communities (partition): repeatedly drop nodes of degree < k until
    * only the k-core remains. Curation use: the k-core of a link/domain
    * graph is the "well-embedded" region (spam farms and orphan pages
    * peel away in the first rounds), the standard cheap prior before
    * running anything quadratic. Round count is FIXED at 4 (the x28/x67
    * bounded-unroll discipline — each extra round doubles the unrolled
    * plan since the edge set feeds both the degree count and the filter;
    * a production run at full depth checkpoints per round exactly as the
    * BPE depth probe demonstrates for x70's loop) and the declared output
    * is the per-round (n_nodes, n_edges) peel trajectory — the curve an
    * operator actually reads to pick k.
    *
    * Scale design (100 TB): each round is one node-keyed degree count
    * with map-side partials plus two semi-join-shaped filters on the
    * edge list — all equi-keyed, no adjacency lists, the standard
    * distributed peel step. Work per round is O(|edges|), monotonically
    * shrinking.
    */
  private val KcoreK = 3
  private val KcoreRounds = 4

  def x73KcorePeel(s: SparkSession, d: String): DataFrame =
    kcorePeelOver(s, coPurchaseEdges(s, d).select(col("a"), col("b")))

  /** The peel loop over an arbitrary a<b edge list — split from the
    * declared key so the empty-core edge (a graph that fully peels
    * mid-trajectory) has a FAST spec fixture: only sf0.1 exercises it
    * through the real corpus, and that gate runs once a round.
    */
  private[graft] def kcorePeelOver(s: SparkSession,
      edges0: DataFrame): DataFrame = {
    // each round's edge set feeds its degree count AND the two filter
    // joins; without a persist every branch re-derives the whole peel
    // chain from the leaf and the output branches explode into ~90 tiny
    // stages (measured 37 s at sf0.1 — pure stage overhead). One lazy
    // persist per round computes each peel exactly once: 37 s → ~4 s.
    //
    // The per-round (n_nodes, n_edges) stats come FREE from the degree
    // table of the FOLLOWING round's peel step — n_nodes(e_r) is deg_r's
    // row count and n_edges(e_r) is sum(deg)/2 (each a<b edge contributes
    // to exactly two endpoint degrees) — so the trajectory costs ONE
    // extra degree aggregate for the last round instead of a separate
    // count + distinct-count (union + second shuffle) + crossJoin per
    // round (the r12 shape: 22 stages / 6.8 s → 14 stages).
    def degOf(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var edges = edges0
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // deg = degree table of the CURRENT edge set; each persisted round-r
    // deg feeds two consumers (round r's stats + round r+1's keep filter)
    var deg = degOf(edges)
    // degs(i) = degree table of the round-(i+1) edge set
    val degs = (1 to KcoreRounds).map { _ =>
      val keep = deg.filter(col("deg") >= KcoreK).select(col("node"))
      edges = edges
        .join(keep.select(col("node").as("a")), Seq("a"))
        .join(keep.select(col("node").as("b")), Seq("b"))
        .select(col("a"), col("b"))
        .persist()
      cached += edges
      // deg is consumed twice (this round's stats + next round's keep) but
      // NOT persisted: both consumers recompute it from the PERSISTED edge
      // set — one cached scan + a tiny shuffle each, cheaper than forcing
      // an extra blocking materialization into the per-round critical path
      deg = degOf(edges)
      deg
    }
    graft.ScopedCache.releaseAfterNextAction(s, cached.toSeq)
    val rounds = degs.zipWithIndex.map { case (deg, i) =>
      deg.agg(count(lit(1)).as("n_nodes"),
          // integer div, not `/` (double round-trip): sum(deg) is even by
          // construction (each a<b edge feeds exactly two endpoint rows).
          // coalesce is load-bearing: a fully-peeled round has an EMPTY
          // degree table, where sum is NULL but the trajectory row must
          // read 0 (sf0.1's 3-core empties at round 4 — the sf0.001/0.01
          // fixtures never exercise this)
          expr("coalesce(sum(deg) div 2, 0L)").as("n_edges"))
        .select(lit((i + 1).toLong).as("round"), col("n_nodes"),
          col("n_edges"))
    }
    rounds.reduce(_ unionByName _).orderBy(col("round"))
  }

  val x73Sql: String = {
    // AS MATERIALIZED is load-bearing: each e_r is referenced 5× (degree
    // union twice, filter join, two output scalar subqueries) — DuckDB's
    // default CTE inlining then expands the 4-round chain exponentially
    // and the oracle never finishes; materialization pins one evaluation
    // per round, which is also exactly what the Spark plan computes
    val rounds = (1 to KcoreRounds).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, COUNT(*) AS deg FROM (
         |    SELECT a AS node FROM e${r - 1}
         |    UNION ALL SELECT b FROM e${r - 1}) GROUP BY node),
         |k$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $KcoreK),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN k$r x ON e.a = x.node
         |  JOIN k$r y ON e.b = y.node)""".stripMargin
    }.mkString(",\n")
    val out = (1 to KcoreRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM (
         |     SELECT a AS node FROM e$r UNION ALL SELECT b FROM e$r)) AS n_nodes,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $coPurchaseEdgesSql,
       |e0 AS (SELECT a, b FROM edges),
       |$rounds
       |$out
       |ORDER BY round""".stripMargin
  }

  // ===== x68: "also bought" common-buyer similarity ========================

  /** Item-item collaborative similarity — the "customers who bought X also
    * bought Y" table: for every part pair, the count of DISTINCT common
    * buyers and the Jaccard of their buyer sets in integer ppm, top-20 by
    * similarity. This is the co-occurrence flavor every recommender
    * bootstrap computes (and the bipartite cousin of x64's wedge closure:
    * here the wedge CENTER is a customer, the legs are parts).
    *
    * Scale design (100 TB): wedge work is Σ_c C(basket(c), 2) — inherently
    * quadratic in basket size, so the declared semantics HUB-DAMPS it:
    * customers with > 256 distinct parts are excluded as centers (the
    * standard co-occurrence discipline — a crawler-bot "customer" with 10⁶
    * items would otherwise contribute 5·10¹¹ wedges; real signal lives in
    * bounded baskets). With the cap, per-customer join groups are ≤ 256
    * rows, pair enumeration is ONE customer-keyed equi-self-join (the
    * WHOLE-STAGE-CODEGEN path — an in-row nested `transform` enumeration
    * was tried and runs 2–3× slower because higher-order functions
    * evaluate interpreted, x65's small-window case notwithstanding), each
    * pair is encoded as ONE primitive long (v·2³² + w; partkeys < 2³¹,
    * v < w from the join condition) so the count keys on a single BIGINT
    * (the q2 intkeys narrow-key discipline), and — because pair keys are
    * ~98% singletons (max common = 5 on the fixture), the q2g regime where
    * partial aggregation combines nothing — the count is PREPARTITIONED by
    * the key and runs co-located in one stage (q2's prepartition lever).
    * Measured at sf0.1/local[32]: 19 s naive → 2.6 s with the three levers.
    * Full buyer degrees (the Jaccard denominator) come from an UNCAPPED
    * part-keyed aggregate, and the min-common ≥ 3 filter shrinks the pair
    * table to the signal before the two degree joins.
    *
    * This exact form is the ground truth; x68b is the declared minhash
    * approximate swap for when even the hub-damped pair table is too big,
    * and x68c holds its recall to a measured floor.
    */
  /** Shared basket machinery for the x68 family: the distinct
    * (customer, part) purchase table `cp` (persisted — the CALLER must hand
    * it to ScopedCache), per-part UNCAPPED buyer counts (the Jaccard
    * denominator), and the hub-damped table `cpd` (customers with > 256
    * distinct parts excluded as wedge centers — see x68's scaladoc).
    */
  private[graft] def basketMachinery(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val cp = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("c")), Seq("ok"))
      .select(col("c"), col("p")).distinct().persist()
    val buyers = cp.groupBy(col("p")).agg(count(lit(1)).as("buyers"))
    val deg = cp.groupBy(col("c")).agg(count(lit(1)).as("dg"))
    val cpd = cp.join(deg.filter(col("dg") <= 256).select(col("c")), Seq("c"))
    (cp, buyers, cpd)
  }

  /** Full exact scored pair table (pre-top-k): distinct-common-buyer count
    * per part pair via the hub-damped equi-self-join, Jaccard in integer
    * ppm. x68 takes its top-20; x68c consumes the whole table as recall
    * ground truth.
    */
  private[graft] def exactPairsScored(s: SparkSession, cpd: DataFrame,
                                      buyers: DataFrame): DataFrame = {
    val parts = 2 * s.conf.get("spark.sql.shuffle.partitions").toInt
    // the engine's AQE posture (16m advisory) would coalesce this ~10MB
    // join input to a single task — but the join OUTPUT is 20× larger
    // than its input (13M pairs from 600k rows), the one case where input
    // size is the wrong parallelism signal. Explicit repartition on the
    // join key keeps the pair enumeration wide (AQE never coalesces a
    // user-specified partition count).
    val wide = cpd.repartition(parts, col("c"))
    val cn = wide.as("x").join(wide.as("y"),
        col("x.c") === col("y.c") && col("x.p") < col("y.p"))
      .select((col("x.p") * lit(4294967296L) + col("y.p")).as("vw"))
      .repartition(parts, col("vw"))
      .groupBy(col("vw")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= 3)
      .select(expr("vw div 4294967296L").as("v"),
        expr("vw % 4294967296L").as("w"), col("common"))
    scorePairs(cn, buyers)
  }

  /** Jaccard-ppm scoring shared by the exact and minhash pair tables. */
  private def scorePairs(cn: DataFrame, buyers: DataFrame): DataFrame =
    cn.join(buyers.select(col("p").as("v"), col("buyers").as("bv")), Seq("v"))
      .join(buyers.select(col("p").as("w"), col("buyers").as("bw")), Seq("w"))
      .select(col("v"), col("w"), col("common"), col("bv"), col("bw"),
        expr("common * 1000000L div (bv + bw - common)").as("jac_ppm"))

  /** Compute-once/consume-many x68-family artifact (r12 verdict #2, the
    * trainedAssignShared pattern): BOTH scored pair tables — exact and
    * minhash-approximate — materialized under one data stamp over the sf
    * dir, built from a single basket-machinery pass (cp persisted across
    * all plan branches of both pipelines, released when the build ends).
    * The three family keys then read the published parquet: x68 and x68b
    * take top-20s of pair-table-sized inputs, and x68c stops re-running
    * both full pipelines per audit — exactly how a production recommender
    * works (the co-occurrence tables are built once per corpus snapshot;
    * every query and audit reads them). All arithmetic is integer, so the
    * materialized tables are bit-identical to the in-plan subtrees they
    * replace; the oracles still replay the full CTE chains and keep
    * hash-matching. The stamp covers the whole sf dir (mtime+length),
    * invalidating on any testdata regeneration; ScaleProbe's cold runs
    * rmrf the layout so exponents still measure the real pipelines.
    */
  private def scoredShared(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    // the layout bakes in ALGORITHM logic, not just a format round-trip, so
    // the path carries a fingerprint of the two oracle strings (the literal
    // replays of both pipelines): any pipeline change must change its
    // oracle in lockstep (the parity discipline), which rotates the path
    // and forces a rebuild — a warm scratch dir can never serve rows built
    // by previous-round code (r13 review). ScaleProbe's cold rmrf matches
    // the graft_x68_shared_ prefix, so stale fingerprints get swept there.
    val algo = java.security.MessageDigest.getInstance("MD5")
      .digest((x68Sql + x68bSql).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val base =
      s"${graft.Scratch.checkpointDir(s)}/graft_x68_shared_${algo}_$tag"
    graft.sources.MultiFormat.ensureLayout(new java.io.File(d), base) {
      val (cp, buyers, cpd) = basketMachinery(s, d)
      try {
        exactPairsScored(s, cpd, buyers).coalesce(8)
          .write.mode("overwrite").parquet(s"$base/exact")
        approxPairsScored(s, cpd, buyers).coalesce(8)
          .write.mode("overwrite").parquet(s"$base/approx")
      } finally { cp.unpersist(): Unit }
    }
    (graft.Tables.cachedParquet(s, s"$base/exact"),
     graft.Tables.cachedParquet(s, s"$base/approx"))
  }

  def x68AlsoBought(s: SparkSession, d: String): DataFrame =
    scoredShared(s, d)._1
      .orderBy(col("jac_ppm").desc, col("v"), col("w"))
      .limit(20)

  val x68Sql: String =
    """WITH cp AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |buyers AS (SELECT p, COUNT(*) AS buyers FROM cp GROUP BY p),
      |deg AS (SELECT c, COUNT(*) AS dg FROM cp GROUP BY c),
      |cpd AS (SELECT cp.c, cp.p FROM cp JOIN deg ON cp.c = deg.c
      |        WHERE deg.dg <= 256),
      |cn AS (
      |  SELECT x.p AS v, y.p AS w, COUNT(*) AS common
      |  FROM cpd x JOIN cpd y ON x.c = y.c AND x.p < y.p
      |  GROUP BY x.p, y.p HAVING COUNT(*) >= 3)
      |SELECT v, w, common, a.buyers AS bv, b.buyers AS bw,
      |       CAST(common * 1000000 // (a.buyers + b.buyers - common)
      |         AS BIGINT) AS jac_ppm
      |FROM cn JOIN buyers a ON a.p = cn.v JOIN buyers b ON b.p = cn.w
      |ORDER BY jac_ppm DESC, v, w LIMIT 20""".stripMargin

  // ===== x68b: "also bought" via minhash banding (the approximate swap) ====

  private val AbPerms = 16
  private val AbP31   = 2147483647L // 2^31 - 1
  private val AbMix   = 2654435761L // Knuth multiplicative scramble
  private def abA(j: Int): Long = 1L + 7919L * (j + 1)
  private def abB(j: Int): Long = 3L + 104729L * (j + 1)

  /** x68's declared 100 TB escape hatch AS CODE: candidate part pairs come
    * from minhash banding over (hub-damped) buyer sets instead of the
    * exhaustive per-customer pair enumeration; candidates are then verified
    * with the EXACT common-buyer count, so every emitted row carries the
    * same exact (common, bv, bw, jac_ppm) values as x68 — the approximation
    * loses only recall, and x68c measures exactly that loss against x68's
    * ground truth.
    *
    * Banding scheme — two data-driven choices, both load-bearing:
    *  - custkeys are SCRAMBLED (`(c·2654435761) mod P31`) before the affine
    *    permutations. Raw custkeys are small enough that `c·a + b` never
    *    wraps mod 2³¹−1 for any of the 16 affine maps, making every
    *    "permutation" monotone in c — all 16 minhashes then agree with
    *    min-custkey and matching is all-or-nothing (measured: per-pair
    *    match count has the right MEAN, 0.80 vs 0.79 expected, but
    *    P(≥1 match) collapses to J ≈ 0.05). The multiplicative scramble
    *    spreads keys across [0, P31) so the affine maps actually permute.
    *  - 16 bands × 1 row, NOT x3's 4×4: buyer-set Jaccards in this domain
    *    are low (top-20 sits at J ≈ 0.075–0.15), where the 4×4 s-curve
    *    1−(1−J⁴)⁴ recalls ~10⁻⁴; 1-row bands give 1−(1−J)¹⁶ ≈ 0.71–0.92.
    *
    * Scale design (100 TB): the signature pass is ONE part-keyed aggregate
    * (16 mins + nothing else) — constant output per part regardless of
    * buyer count. Band buckets are intrinsically bounded: bucket (j, h)
    * contains only parts whose minimizing BUYER hashes to h, i.e. it is a
    * subset of that one customer's basket, so with the ≤256 hub cap no
    * bucket exceeds 256 rows and per-bucket pair work is ≤ C(256,2)
    * whatever the corpus size. Exact verification touches candidates only.
    * Where x68's exact enumeration pays one row per (pair, common buyer),
    * the banding pays one row per (pair, matching band) ≈ 16·J per pair —
    * the constant 16 replaces the data-density-driven common-buyer count,
    * which is the asymptotic win when baskets densify at scale.
    */
  private[graft] def approxPairsScored(s: SparkSession, cpd: DataFrame,
                                       buyers: DataFrame): DataFrame = {
    SortedIntersectCount.register(s)
    val parts = 2 * s.conf.get("spark.sql.shuffle.partitions").toInt
    // c is masked to 31 bits BEFORE the multiply: (2³¹−1)·2654435761 ≈
    // 5.7·10¹⁸ < Long.Max, whereas a raw custkey above ~3.47·10⁹ would
    // overflow c·AbMix — Spark wraps silently (negative hc degrades all 16
    // signatures) while DuckDB raises, so the two engines would diverge
    // exactly at the 100 TB key domains this escape hatch targets (r12
    // ADVICE). At the test SFs custkeys are < 2³¹ and the mask is identity.
    val hashed = cpd.select(col("p"), col("c"),
      expr(s"((c & 2147483647L) * ${AbMix}L) % ${AbP31}L").as("hc"))
    val minCols = (0 until AbPerms).map(j =>
      min(expr(s"(hc * ${abA(j)}L + ${abB(j)}L) % ${AbP31}L")).as(s"m$j"))
    val sig = hashed.groupBy(col("p")).agg(minCols.head, minCols.tail: _*)
    val bandSig = (0 until AbPerms).map(j => s"$j, m$j").mkString(", ")
    // band self-join output ≫ its input (same AQE-coalesce trap as the
    // exact pair enumeration) — keep it wide via explicit repartition on
    // the join key; the vw repartition below co-locates the dedup the
    // same way x68's pair count does
    val bands = sig.select(col("p"),
        expr(s"stack($AbPerms, $bandSig) as (band, sig)"))
      .repartition(parts, col("band"), col("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.p") < col("y.p"))
      .select(col("x.p").as("v"), col("y.p").as("w"))
    // VERIFY on candidates only — but NOT by re-joining the purchase table:
    // banding admits ~350× more candidates than qualifying pairs (they
    // mostly share exactly the one minimizing buyer), and a cand ⋈ cp
    // count-join explodes each candidate into buyers(v) rows before the
    // second join can filter (measured 78M intermediate rows / 40+ s at
    // sf0.1). Instead each part carries its SORTED buyer array once
    // (part-domain-sized table → broadcast hash joins, zero shuffle of the
    // candidate stream) and the codegen'd two-pointer merge
    // (graft_sorted_intersect_count, x9's verify kernel) counts the exact
    // intersection in-row. Verify runs BEFORE candidate dedup: deduping the
    // 3.5M-row collision stream is a full shuffle of it, while verifying
    // first costs only the duplicate merges (a pair colliding in k bands is
    // merged k times) and shrinks the distinct's input ~700× to the
    // post-threshold survivors — the whole candidate path is then one
    // stage pipelined off the band join.
    val sets = cpd.groupBy(col("p"))
      .agg(sort_array(collect_list(col("c").cast("long"))).as("cs"),
           count(lit(1)).as("nb"))
      // PPJoin-style length bound, the array-side mirror of the customer
      // hub cap: a part with B buyers has J ≤ |partner|/B against any
      // partner, so mega-hub parts cannot reach a similarity top-k against
      // normal-sized ones and would only bloat the broadcast rows. No part
      // approaches the bound at the test SFs (max ≈ 35 buyers), and x68c
      // audits any recall this ever costs against the uncapped exact truth.
      .filter(col("nb") <= 65536)
      .select(col("p"), col("cs"))
    // SIZE-GATE the verify broadcast (r12 verdict #1 — the last surviving
    // scale-killer): sets is part-domain-sized, and at 100 TB a billions-
    // of-parts × sorted-buyer-array table cannot ship to every executor.
    // Below the gate (counted against the persisted cp — one cheap
    // aggregate) the two joins broadcast, zero shuffle of the candidate
    // stream. Above it — or when the conf is set ≤ 0, which skips even the
    // sizing count — the verify becomes two SHUFFLE-HASH joins of the
    // candidate stream against sets partitioned by part (the hint pins the
    // strategy so AQE cannot promote the big side back to a broadcast).
    // Default 4M parts: ~4·10⁶ rows × (avg ~40 buyers × 8 B) ≈ 1.3 GB of
    // array payload, comfortably under Spark's 8 GB broadcast hard cap
    // while keeping every test SF (≤ 2·10⁵ parts) on the broadcast path.
    // Same rows either way — only recall-free plan shape changes — and the
    // fallback's scaling exponent is measured against the broadcast path's
    // in docs/scaling_probe.json (x68b_shuffle_verify vs x68b_bcast_verify).
    val maxParts = s.conf.getOption("spark.graft.x68b.verifyBroadcastMaxParts")
      .getOrElse("4000000").toLong
    val setsV = sets.select(col("p").as("v"), col("cs").as("csv"))
    val setsW = sets.select(col("p").as("w"), col("cs").as("csw"))
    val joined =
      if (maxParts > 0 && buyers.count() <= maxParts)
        cand.join(broadcast(setsV), Seq("v"))
          .join(broadcast(setsW), Seq("w"))
      else
        cand.join(setsV.hint("shuffle_hash"), Seq("v"))
          .join(setsW.hint("shuffle_hash"), Seq("w"))
    val cn = joined
      .select(col("v"), col("w"),
        expr("graft_sorted_intersect_count(csv, csw)").as("common"))
      .filter(col("common") >= 3)
      .distinct()
    scorePairs(cn, buyers)
  }

  def x68bAlsoBoughtMinhash(s: SparkSession, d: String): DataFrame =
    scoredShared(s, d)._2
      .orderBy(col("jac_ppm").desc, col("v"), col("w"))
      .limit(20)

  /** Direct (artifact-free) pipeline run for ScaleProbe and Round13Spec —
    * the shared layout would otherwise hide the pipeline's real cost and
    * pin the verify-join strategy to whatever conf built it. `maxParts`
    * overrides the broadcast gate for THIS plan build only ("0" forces
    * the shuffle-hash fallback without paying the sizing count).
    */
  private[graft] def x68bPipelineProbe(maxParts: String)
      (s: SparkSession, d: String): DataFrame = {
    val key = "spark.graft.x68b.verifyBroadcastMaxParts"
    val prev = s.conf.getOption(key)
    s.conf.set(key, maxParts)
    try {
      val (cp, buyers, cpd) = basketMachinery(s, d)
      // the gate's sizing count (broadcast path) runs inside
      // approxPairsScored — register the release AFTER it so that action
      // doesn't evict cp before the main query runs; if the sizing action
      // itself throws, unpersist eagerly or cp leaks into every later run
      val scored =
        try approxPairsScored(s, cpd, buyers)
        catch { case t: Throwable => cp.unpersist(); throw t }
      graft.ScopedCache.releaseAfterNextAction(s, Seq(cp))
      scored
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Direct exact-pipeline run (same role as [[x68bPipelineProbe]]). */
  private[graft] def x68ExactProbe(s: SparkSession, d: String): DataFrame = {
    val (cp, buyers, cpd) = basketMachinery(s, d)
    graft.ScopedCache.releaseAfterNextAction(s, Seq(cp))
    exactPairsScored(s, cpd, buyers)
  }

  /** Basket + exact-pair CTEs shared by the x68b/x68c oracles (x68Sql's
    * own text is kept verbatim — a green oracle is never perturbed).
    */
  private val basketSql: String =
    """cp AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |buyers AS (SELECT p, COUNT(*) AS buyers FROM cp GROUP BY p),
      |deg AS (SELECT c, COUNT(*) AS dg FROM cp GROUP BY c),
      |cpd AS (SELECT cp.c, cp.p FROM cp JOIN deg ON cp.c = deg.c
      |        WHERE deg.dg <= 256),
      |cne AS (
      |  SELECT x.p AS v, y.p AS w, COUNT(*) AS common
      |  FROM cpd x JOIN cpd y ON x.c = y.c AND x.p < y.p
      |  GROUP BY x.p, y.p HAVING COUNT(*) >= 3),
      |exact AS (
      |  SELECT v, w, common, a.buyers AS bv, b.buyers AS bw,
      |         CAST(common * 1000000 // (a.buyers + b.buyers - common)
      |           AS BIGINT) AS jac_ppm
      |  FROM cne JOIN buyers a ON a.p = cne.v
      |  JOIN buyers b ON b.p = cne.w)""".stripMargin

  /** DuckDB replay of [[approxPairsScored]]: scrambled-affine minhash
    * signatures, 16×1 banding, candidate dedup, exact verify.
    */
  private def abMinhashSql: String = {
    val mins = (0 until AbPerms)
      .map(j => s"MIN((((c & 2147483647) * $AbMix % $AbP31) * ${abA(j)}::BIGINT + " +
        s"${abB(j)}) % $AbP31) AS m$j")
      .mkString(", ")
    val bandRows = (0 until AbPerms)
      .map(j => s"SELECT p, $j AS band, m$j AS sig FROM sig")
      .mkString(" UNION ALL ")
    s"""sig AS (SELECT p, $mins FROM cpd GROUP BY p),
       |bands AS ($bandRows),
       |cand AS (
       |  SELECT DISTINCT x.p AS v, y.p AS w FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.sig = y.sig AND x.p < y.p),
       |psz AS (SELECT p, COUNT(*) AS nb FROM cpd GROUP BY p),
       |cna AS (
       |  SELECT cd.v, cd.w, COUNT(*) AS common
       |  FROM cand cd
       |  JOIN psz pv ON pv.p = cd.v AND pv.nb <= 65536
       |  JOIN psz pw ON pw.p = cd.w AND pw.nb <= 65536
       |  JOIN cpd x ON cd.v = x.p
       |  JOIN cpd y ON cd.w = y.p AND x.c = y.c
       |  GROUP BY cd.v, cd.w HAVING COUNT(*) >= 3),
       |approx AS (
       |  SELECT v, w, common, a.buyers AS bv, b.buyers AS bw,
       |         CAST(common * 1000000 // (a.buyers + b.buyers - common)
       |           AS BIGINT) AS jac_ppm
       |  FROM cna JOIN buyers a ON a.p = cna.v
       |  JOIN buyers b ON b.p = cna.w)""".stripMargin
  }

  val x68bSql: String =
    s"""WITH $basketSql,
       |$abMinhashSql
       |SELECT v, w, common, bv, bw, jac_ppm FROM approx
       |ORDER BY jac_ppm DESC, v, w LIMIT 20""".stripMargin

  // ===== x68c: banding recall audit vs exact x68 ground truth ==============

  /** The x63 audit pattern applied to x68b: recall of the minhash swap
    * against the exact pair table, at two scopes —
    *  - `pairs`: all qualifying pairs (common ≥ 3). Every x68b row is by
    *    construction also an exact row (candidates are verified with exact
    *    counts), so found/truth IS recall, no intersection join needed.
    *  - `top20`: how many of x68's exact top-20 rows the approximate
    *    top-20 recovers (semi-join on the pair key) — the floor the swap
    *    is held to (measured ≥ 12/20 at sf0.001/0.01/0.1; Round12Spec
    *    pins ≥ 50%).
    * Integer-ppm output, exact on both engines.
    */
  def x68cAlsoBoughtRecall(s: SparkSession, d: String): DataFrame = {
    // both scored tables feed TWO branches each (top-20 + full count) and
    // are read from the shared data-stamped parquet — no pipeline re-run,
    // no persist needed (pair-table-after-threshold sized parquet scans)
    val (exact, approx) = scoredShared(s, d)
    val exTop = exact.orderBy(col("jac_ppm").desc, col("v"), col("w")).limit(20)
    val apTop = approx.orderBy(col("jac_ppm").desc, col("v"), col("w")).limit(20)
    val topTruth  = exTop.agg(count(lit(1)).as("n_truth"))
    val topFound  = exTop.join(apTop.select(col("v"), col("w")),
        Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    val pairTruth = exact.agg(count(lit(1)).as("n_truth"))
    val pairFound = approx.agg(count(lit(1)).as("n_found"))
    // single-row aggregate cross joins (x64's shape, AuditSpec-allowlisted)
    def row(scope: String, t: DataFrame, f: DataFrame): DataFrame =
      t.crossJoin(f).select(lit(scope).as("scope"), col("n_truth"),
        col("n_found"),
        expr("n_found * 1000000L div n_truth").as("recall_ppm"))
    row("pairs", pairTruth, pairFound)
      .unionByName(row("top20", topTruth, topFound))
      .orderBy(col("scope"))
  }

  val x68cSql: String =
    s"""WITH $basketSql,
       |$abMinhashSql,
       |ext AS (SELECT v, w FROM exact ORDER BY jac_ppm DESC, v, w LIMIT 20),
       |apt AS (SELECT v, w FROM approx ORDER BY jac_ppm DESC, v, w LIMIT 20)
       |SELECT 'pairs' AS scope,
       |       (SELECT COUNT(*) FROM exact) AS n_truth,
       |       (SELECT COUNT(*) FROM approx) AS n_found,
       |       CAST((SELECT COUNT(*) FROM approx) * 1000000
       |         // (SELECT COUNT(*) FROM exact) AS BIGINT) AS recall_ppm
       |UNION ALL
       |SELECT 'top20',
       |       (SELECT COUNT(*) FROM ext),
       |       (SELECT COUNT(*) FROM ext e JOIN apt a
       |          ON e.v = a.v AND e.w = a.w),
       |       CAST((SELECT COUNT(*) FROM ext e JOIN apt a
       |          ON e.v = a.v AND e.w = a.w) * 1000000
       |         // (SELECT COUNT(*) FROM ext) AS BIGINT)
       |ORDER BY scope""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x28_pagerank"             -> (x28Pagerank _),
    "x64_triangle_count"       -> (x64TriangleCount _),
    "x67_lpa_communities"      -> (x67LpaCommunities _),
    "x68_also_bought"          -> (x68AlsoBought _),
    "x68b_also_bought_minhash" -> (x68bAlsoBoughtMinhash _),
    "x68c_also_bought_recall"  -> (x68cAlsoBoughtRecall _),
    "x73_kcore_peel"           -> (x73KcorePeel _)
  )

  val oracles: Map[String, String] = Map(
    "x28_pagerank"             -> x28Sql,
    "x64_triangle_count"       -> x64Sql,
    "x67_lpa_communities"      -> x67Sql,
    "x68_also_bought"          -> x68Sql,
    "x68b_also_bought_minhash" -> x68bSql,
    "x68c_also_bought_recall"  -> x68cSql,
    "x73_kcore_peel"           -> x73Sql
  )
}
