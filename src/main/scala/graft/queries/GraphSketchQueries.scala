package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.datapipe.{Cooccurrence, Graph, PageRank, Sketches}
import graft.functions.Log2FixedExpr
import graft.util.{Tables, Tok}

/** q143 (integer PageRank) and q144 (HyperLogLog) — graph authority
  * scoring and fixed-state distinct counting, the two classic
  * curation-pipeline primitives the surface still lacked. Both are
  * exact-integer end-to-end so DuckDB replays every step. */
object GraphSketchQueries {

  /** Iteration count for q143. Convergence rate is governed by the
    * damping factor (|λ₂| ≤ d = 0.85 for PageRank), so the iterate
    * moves by ≲ 0.85^t — 16 steps ≈ 7% residual, plenty to make the
    * ranking meaningful while keeping the oracle at 16 unrolled
    * edge-relation joins. (Exactness does NOT depend on convergence:
    * the oracle replays the same 16 truncating-integer steps.) */
  private val PrIters = 16

  /** Integer PageRank over the customer↔supplier purchase graph
    * (q143): nodes 'c:<custkey>' and 's:<suppkey>', one edge per
    * DISTINCT (customer, supplier) purchase pair, symmetrized — so
    * every node has out-degree ≥ 1 and the dangling-mass term
    * vanishes (see [[PageRank]]). The graph build is the part that
    * touches all 100 TB (one orders⋈lineitem join + distinct); the
    * 16 iterations shuffle only node-sized rank relations against
    * the once-partitioned edge set. Emits every node's ×2⁴⁰
    * fixed-point rank. */
  /** The symmetrized customer↔supplier purchase graph with integer
    * node ids (customers even, suppliers odd — disjoint without a
    * dictionary; the 'c:'/'s:' presentation strings exist only in
    * final projections. String keys hashed/shuffled T times are the
    * classic avoidable cost of iterative graph jobs). Shared by q143
    * and q147. */
  private def purchaseGraph(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // one-pass symmetrize: the union form ran the join+distinct twice
    Graph.mirrored(e0, "src", "dst")
  }

  /** The even/odd integer id rendered back to its 'c:'/'s:' string. */
  private def nodeStr(c: String) =
    when(col(c) % 2 === 0, concat(lit("c:"), expr(s"$c div 2").cast("string")))
      .otherwise(concat(lit("s:"), expr(s"$c div 2").cast("string")))

  def pageRankQ(s: SparkSession, d: String): DataFrame = {
    PageRank.pageRankFixed(purchaseGraph(s, d), PrIters, broadcastRanks = true)
      .select(nodeStr("node").as("node"), col("r").as("rank_fp"))
      .orderBy(col("node"))
  }

  /** q151 seed suppliers (suppkeys 1–3 → odd integer ids 3, 5, 7). */
  private val PprSeedKeys = Seq(1L, 2L, 3L)

  /** Personalized PageRank (q151): teleport mass restricted to three
    * seed suppliers, ranking every node by random-walk proximity to
    * them (Jeh & Widom 2003) — the graph-retrieval/recommendation
    * primitive ("customers and suppliers most associated with this
    * supplier pool"), where q143 measures global authority. Same
    * distributed iteration shape as q143; the seed test is a codegen'd
    * `isin` literal, no extra join. Oracle: the q143 replay with the
    * seed-restricted teleport and start vector. */
  def personalizedPageRankQ(s: SparkSession, d: String): DataFrame =
    PageRank.pageRankFixed(purchaseGraph(s, d), PrIters,
        broadcastRanks = true, seeds = PprSeedKeys.map(_ * 2 + 1))
      .select(nodeStr("node").as("node"), col("r").as("rank_fp"))
      .orderBy(col("node"))

  def personalizedPageRankOracle: String =
    prOracle(PprSeedKeys.map(k => s"s:$k"))

  /** q147 iteration count: LPA converges in a handful of sweeps on
    * most graphs (Raghavan et al. report ~5); 8 keeps the oracle at 8
    * unrolled joins. Determinism never depends on convergence. */
  private val LpIters = 8

  /** Label-propagation communities (q147) on the purchase graph —
    * the label a node settles on IS its community (co-purchase
    * cluster: which customer population shares which supplier pool).
    * Deterministic self-retaining synchronous LPA ([[Graph.labelPropagation]]);
    * the oracle replays all 8 sweeps, argmax tie-breaks included. On
    * TPC-H's uniform purchase pattern the graph has NO community
    * structure, so LPA correctly collapses to the bipartition (all
    * customers → c:0, all suppliers → s:0) — the planted-partition
    * recovery that shows the operator working lives in `GraphSpec`. */
  def labelPropQ(s: SparkSession, d: String): DataFrame =
    Graph.labelPropagation(purchaseGraph(s, d), LpIters)
      .select(nodeStr("node").as("node_s"), nodeStr("label").as("community"))
      .select(col("node_s").as("node"), col("community"))
      .orderBy(col("node"))

  def labelPropOracle: String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |), e AS MATERIALIZED (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
         |), l0 AS MATERIALIZED (
         |  SELECT DISTINCT src AS node, src AS label FROM e
         |)""".stripMargin
    for (t <- 1 to LpIters) sb ++=
      s""",
         | l$t AS MATERIALIZED (
         |  SELECT dst AS node, label FROM (
         |    SELECT dst, label,
         |      row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, label ASC) AS rn
         |    FROM (
         |      SELECT v.dst, v.label, CAST(count(*) AS BIGINT) AS cnt FROM (
         |        SELECT e.dst, c.label FROM e JOIN l${t - 1} c ON c.node = e.src
         |        UNION ALL SELECT node AS dst, label FROM l${t - 1}
         |      ) v GROUP BY v.dst, v.label
         |    )
         |  ) WHERE rn = 1
         |)""".stripMargin
    sb ++=
      s"""
         |SELECT
         |  CASE WHEN node % 2 = 0 THEN 'c:' || CAST(node // 2 AS VARCHAR)
         |       ELSE 's:' || CAST(node // 2 AS VARCHAR) END AS node,
         |  CASE WHEN label % 2 = 0 THEN 'c:' || CAST(label // 2 AS VARCHAR)
         |       ELSE 's:' || CAST(label // 2 AS VARCHAR) END AS community
         |FROM l$LpIters ORDER BY node""".stripMargin
    sb.toString
  }

  /** The whole 16-step solve replayed in DuckDB: same symmetric edge
    * relation, same truncating `//` at every step (BIGINT throughout
    * — max intermediate ≈ 85·2⁴⁰ ≪ 2⁶³). MATERIALIZED per iterate:
    * each r_t is consumed by r_{t+1}'s join; without it the chain
    * re-inlines multiplicatively. */
  def pageRankOracle: String = prOracle(Nil)

  /** Shared q143/q151 oracle builder: `seeds` empty replays global
    * PageRank, non-empty replays the personalized variant (teleport
    * and start mass on the seed set only). */
  private def prOracle(seeds: Seq[String]): String = {
    val fp = PageRank.Fp
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    val baseSql =
      if (seeds.isEmpty) s"(15 * $fp) // (100 * (SELECT n FROM nn))"
      else s"CASE WHEN e.dst IN ($seedList) THEN (15 * $fp) // (100 * ${seeds.length}) ELSE 0 END"
    val r0Sql =
      if (seeds.isEmpty) s"$fp // (SELECT n FROM nn)"
      else s"CASE WHEN src IN ($seedList) THEN ${fp / seeds.length} ELSE 0 END"
    val sb = new StringBuilder
    sb ++=
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
         |    's:' || CAST(l_suppkey AS VARCHAR) AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |), e AS MATERIALIZED (
         |  SELECT src, dst FROM e0
         |  UNION ALL SELECT dst AS src, src AS dst FROM e0
         |), deg AS MATERIALIZED (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
         |), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
         | r0 AS (SELECT src AS node, $r0Sql AS r FROM deg)""".stripMargin
    for (t <- 1 to PrIters) sb ++=
      s""",
         | r$t AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    $baseSql +
         |    (85 * CAST(SUM(c.r // c.deg) AS BIGINT)) // 100 AS r
         |  FROM e JOIN (
         |    SELECT node, r, deg FROM r${t - 1} JOIN deg ON deg.src = r${t - 1}.node
         |  ) c ON c.node = e.src
         |  GROUP BY e.dst
         |)""".stripMargin
    sb ++=
      s"""
         |SELECT node, r AS rank_fp FROM r$PrIters ORDER BY node""".stripMargin
    sb.toString
  }

  /** Triangle census of the verified near-dup graph (q145): nodes =
    * documents, edges = the q13 LSH-candidate pairs that pass exact
    * Jaccard ≥ 0.5 — so this measures the STRUCTURE of what dedup
    * would merge: cc_fp = 2²⁰ for a node means its neighborhood is
    * pairwise-duplicate (a true duplicate family); cc_fp = 0 with
    * deg ≥ 2 means the node is a bridge in a chain of borderline
    * pairs, the known MinHash-transitivity failure mode. Emits
    * (doc_id, deg, tri, cc_fp) for every non-isolated node — see
    * [[Graph.triangleCensus]] for the O(√m)-bounded orientation plan.
    * The edge build is the 100 TB part and is exactly q13's (bucketed
    * LSH, never all-pairs); the census is output-bound on the edge
    * relation. */
  def triangleCensus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    Graph.triangleCensus(edges)
      .select(col("node").as("doc_id"), col("deg"), col("tri"), col("cc_fp"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the q13 mirrored candidate-pair chain → thresholded edge
    * set, then the SAME degree-orientation wedge join and truncating
    * cc division. */
  def triangleOracle: String =
    s"""WITH $censusCtes
       |SELECT d.node AS doc_id, d.deg, COALESCE(t.tri, 0) AS tri,
       |  CASE WHEN d.deg >= 2
       |    THEN (2 * COALESCE(t.tri, 0) * ${Graph.CcFp})
       |      // (d.deg * (d.deg - 1))
       |    ELSE 0 END AS cc_fp
       |FROM deg d LEFT JOIN tcnt t ON t.node = d.node
       |ORDER BY doc_id""".stripMargin

  /** The near-dup edge set + degrees (pairs → ned/deg) — the prefix
    * every near-dup-graph oracle shares ([[censusCtes]], q156
    * coreness). */
  private def nedDegCtes: String =
    s"""${DataPipeQueries.minhashPairsCtes("documents")}, ned AS MATERIALIZED (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |), deg AS MATERIALIZED (
       |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS node FROM ned UNION ALL SELECT v FROM ned
       |  ) GROUP BY node
       |)""".stripMargin

  /** The near-dup-graph census CTE chain (pairs → ned/deg/orient/tri/
    * tcnt) shared by [[triangleOracle]] (= the q150 oracle) and the
    * q155 graph card. */
  private def censusCtes: String =
    s"""$nedDegCtes, orient AS MATERIALIZED (
       |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.u < e.v)
       |           THEN e.u ELSE e.v END AS src,
       |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.u < e.v)
       |           THEN e.v ELSE e.u END AS dst
       |  FROM ned e
       |  JOIN deg da ON da.node = e.u
       |  JOIN deg db ON db.node = e.v
       |), tri AS MATERIALIZED (
       |  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
       |  FROM orient o1
       |  JOIN orient o2 ON o2.src = o1.src AND o1.dst < o2.dst
       |  JOIN ned e ON e.u = least(o1.dst, o2.dst)
       |    AND e.v = greatest(o1.dst, o2.dst)
       |), tcnt AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
       |    SELECT a AS node FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri
       |  ) GROUP BY node
       |)""".stripMargin

  /** q174 iteration count: HITS converges geometrically in the gap of
    * AᵀA's spectrum; 4 double-steps rank TPC-H's near-uniform graph
    * stably, and exactness never depends on convergence — the oracle
    * replays the same 4 truncating-integer double-steps. */
  private val HitsIters = 4

  /** HITS hubs & authorities (q174, Kleinberg JACM'99) on the DIRECTED
    * customer→supplier purchase graph — the asymmetric companion to
    * q143's PageRank: hubs (customers whose purchases concentrate on
    * authoritative suppliers) and authorities (suppliers bought by
    * strong hubs) get SEPARATE scores, which symmetrized PageRank
    * structurally cannot give.
    *
    * Exact-integer scheme: scores carry ×2²⁰; each half-step is
    * `score' = (Σ counterpart) · 2²⁰ div max(Σ counterpart)` — MAX
    * normalization instead of the classical L2 (no integer sqrt
    * needed, same fixed point of the iteration up to scale). Max
    * intermediate is 2⁴⁰·maxdeg, so maxdeg < 2²³ is ENFORCED (8M
    * distinct counterparties per node — far beyond any real
    * purchase graph; raised, not assumed).
    *
    * Shape at scale: the graph build is the 100 TB part (orders ⋈
    * lineitem + distinct); each half-step is one broadcast-sized
    * score join against the once-persisted edge relation + one
    * map-side-combined sum — node-sized shuffles only, the q143
    * shape. The max() per half-step is a driver scalar over an
    * already-aggregated node relation. */
  /** The (customer, supplier) distinct bipartite edge relation the
    * HITS/CF family iterates over — exposed for `PlanAuditSpec`. */
  private[queries] def purchaseEdgesForAudit(s: SparkSession,
      d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()

  /** One HITS half-step — rank mass pushed across the bipartite edge
    * relation as ONE equi-join + ONE map-side-combined sum (the
    * node-level rank side is dimension-sized next to edges, so AQE
    * broadcasts it at runtime). Factored out so `PlanAuditSpec` pins
    * the step's physical shape directly. */
  private[queries] def hitsHalfStep(e: DataFrame, ranks: DataFrame,
      srcCol: String, dstCol: String): DataFrame =
    e.join(ranks, col(srcCol) === col("node"))
      .groupBy(col(dstCol)).agg(sum(col("sc")).as("sc"))

  def hitsQ(s: SparkSession, d: String): DataFrame = {
    val fp = 1L << 20
    val e0 = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()
      .persist()
    val nE = e0.count()
    // volume-sized layout for the per-half-step scans (round 18): the
    // distinct's cpus-sized partitioning made every half-step pay cpus
    // near-empty tasks; the rank side is broadcast either way
    val e = e0.repartition(Graph.sizedParts(e0, nE), col("c")).persist()
    e.count()
    e0.unpersist()
    val maxDeg = math.max(
      e.groupBy(col("c")).count().agg(max("count")).head().getLong(0),
      e.groupBy(col("sp")).count().agg(max("count")).head().getLong(0))
    require(maxDeg < (1L << 23),
      s"hitsQ headroom: max degree $maxDeg >= 2^23 would overflow " +
        "score*fp - dictionary-compress the hot side first")
    var h = e.select(col("c")).distinct()
      .select(col("c").as("node"), lit(fp).as("sc")).localCheckpoint(true)
    var a: DataFrame = null
    for (_ <- 1 to HitsIters) {
      // the max-normalized projection is scalar arithmetic over the
      // checkpointed raw sums — consumers re-read cached blocks, so a
      // second eager barrier per half-step bought nothing (round 18)
      val araw = hitsHalfStep(e, h, "c", "sp").localCheckpoint(true)
      val amax = araw.agg(max("sc")).head().getLong(0)
      a = araw.select(col("sp").as("node"),
        expr(s"(sc * $fp) div ${amax}L").as("sc"))
      val hraw = hitsHalfStep(e, a, "sp", "c").localCheckpoint(true)
      val hmax = hraw.agg(max("sc")).head().getLong(0)
      h = hraw.select(col("c").as("node"),
        expr(s"(sc * $fp) div ${hmax}L").as("sc"))
    }
    e.unpersist()
    h.select(concat(lit("c:"), col("node").cast("string")).as("node"),
        lit("hub").as("score_type"), col("sc").as("score_fp"))
      .unionByName(
        a.select(concat(lit("s:"), col("node").cast("string")).as("node"),
          lit("auth").as("score_type"), col("sc").as("score_fp")))
      .orderBy(col("node"))
  }

  /** The whole 4-double-step HITS solve replayed in DuckDB: same edge
    * relation, same truncating `//` max-normalization per half-step. */
  def hitsOracle: String = {
    val fp = 1L << 20
    val sb = new StringBuilder
    sb ++=
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |), h0 AS MATERIALIZED (
         |  SELECT DISTINCT c AS node, CAST($fp AS BIGINT) AS sc FROM e
         |)""".stripMargin
    for (t <- 1 to HitsIters) sb ++=
      s""",
         | a${t}r AS MATERIALIZED (
         |  SELECT e.sp AS node, CAST(SUM(h.sc) AS BIGINT) AS sc
         |  FROM e JOIN h${t - 1} h ON h.node = e.c GROUP BY e.sp
         |), a$t AS MATERIALIZED (
         |  SELECT node, (sc * $fp) // (SELECT max(sc) FROM a${t}r) AS sc FROM a${t}r
         |), h${t}r AS MATERIALIZED (
         |  SELECT e.c AS node, CAST(SUM(a.sc) AS BIGINT) AS sc
         |  FROM e JOIN a$t a ON a.node = e.sp GROUP BY e.c
         |), h$t AS MATERIALIZED (
         |  SELECT node, (sc * $fp) // (SELECT max(sc) FROM h${t}r) AS sc FROM h${t}r
         |)""".stripMargin
    sb ++=
      s"""
         |SELECT node, score_type, score_fp FROM (
         |  SELECT 'c:' || CAST(node AS VARCHAR) AS node, 'hub' AS score_type,
         |    sc AS score_fp FROM h$HitsIters
         |  UNION ALL
         |  SELECT 's:' || CAST(node AS VARCHAR), 'auth', sc FROM a$HitsIters
         |) ORDER BY node""".stripMargin
    sb.toString
  }

  /** q175 relaxation rounds: distances beyond 8 hops in a near-dup
    * graph mean the transitive chain is already broken for curation
    * purposes; unreached nodes are simply absent (both engines drop
    * them identically). */
  private val BfsRounds = 8

  /** Multi-source BFS distance (q175) over the verified near-dup
    * graph: hop distance from the audited seed set (every 7th doc id)
    * to every reachable node — "how far is this document from an
    * already-reviewed duplicate?", the triage radius a manual-review
    * queue is ordered by. 8 synchronous min-relaxation rounds
    * (Bellman-Ford restricted to unit weights), every value an exact
    * integer; the oracle replays all 8 rounds.
    *
    * Shape at scale: the edge build is exactly q13's (bucketed LSH,
    * never all-pairs); each round is frontier ⋈ edges + a
    * map-side-combined min — node-sized shuffles against the
    * once-persisted symmetric edge relation, the q143 iteration
    * shape. */
  /** One BFS expansion round — frontier pushed along the symmetric
    * edge relation (equi-join), then a map-side-combined min with the
    * standing distances. Factored out so `PlanAuditSpec` pins the
    * round's physical shape directly. */
  private[queries] def bfsExpand(sym: DataFrame, dist: DataFrame): DataFrame =
    dist.unionByName(
        sym.join(dist, col("u") === col("node"))
          .select(col("v").as("node"), (col("dist") + 1L).as("dist")))
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))

  def bfsDistQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ned = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    // one-pass symmetrize: the union form ran the minhash chain twice.
    // Volume-sized u-keyed layout (round 18): every round's frontier
    // join probes this relation; without it the rounds inherit the
    // minhash chain's cpus-sized partitioning (near-empty tasks).
    val sym0 = Graph.mirrored(ned, "u", "v").persist()
    val nSym = sym0.count()
    val sym = sym0.repartition(Graph.sizedParts(sym0, nSym), col("u"))
      .persist()
    sym.count()
    sym0.unpersist()
    var dist = sym.select(col("u").as("node")).distinct()
      .filter(col("node") % 7 === 0)
      .select(col("node"), lit(0L).as("dist")).localCheckpoint(true)
    for (_ <- 1 to BfsRounds) {
      dist = bfsExpand(sym, dist).localCheckpoint(true)
    }
    sym.unpersist()
    dist.select(col("node").as("doc_id"), col("dist"))
      .orderBy(col("doc_id"))
  }

  def bfsDistOracle: String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH $nedDegCtes, sym AS MATERIALIZED (
         |  SELECT u, v FROM ned UNION ALL SELECT v AS u, u AS v FROM ned
         |), d0 AS MATERIALIZED (
         |  SELECT node, CAST(0 AS BIGINT) AS dist FROM deg WHERE node % 7 = 0
         |)""".stripMargin
    for (t <- 1 to BfsRounds) sb ++=
      s""",
         | d$t AS MATERIALIZED (
         |  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
         |    SELECT node, dist FROM d${t - 1}
         |    UNION ALL
         |    SELECT e.v AS node, d.dist + 1 AS dist
         |    FROM sym e JOIN d${t - 1} d ON d.node = e.u
         |  ) GROUP BY node
         |)""".stripMargin
    sb ++=
      s"""
         |SELECT node AS doc_id, dist FROM d$BfsRounds ORDER BY doc_id""".stripMargin
    sb.toString
  }

  /** Top-K partners per supplier (q176). */
  private val CoPurchaseK = 5

  /** Item-item collaborative filtering (q176, Linden et al. IEEE IC'03
    * — the Amazon "customers who bought X also bought Y" shape) on
    * the customer→supplier bipartite graph: for every supplier, the
    * top-5 co-purchased partner suppliers by exact customer-set
    * Jaccard ×2²⁰, with the co-purchase count and both distinct
    * customer degrees. (A near-dup doc graph has no such structure —
    * its Jaccard is bimodal, dup or not; the purchase graph is where
    * neighborhood similarity means something.)
    *
    * Shape at scale: co-occurrence pairs come from the wedge join
    * through customers — Σ_c C(deg_c, 2) with customer fan-out
    * bounded by purchase activity, the standard CF co-occurrence
    * bound (production systems cap the hot-user degree upstream; TPC-H
    * maxes at ~30). The top-K is TWO-PHASE: a streaming map-side
    * local prune ([[graft.datapipe.TopK.localTopKPrune]] — bounded
    * per-supplier buffers in a per-task hash map, no sort, no object
    * aggregation; see its scaladoc for why the typed Aggregator
    * drowned here at 100×) cuts the pair relation to ≤ K·|suppliers|·
    * |partitions| rows BEFORE any exchange, and only that pruned
    * relation flows into the exact supplier-keyed row_number window —
    * so the full pair relation is never sorted and never shuffled
    * whole (the r14-measured 2×-over-linear sort constant). The
    * (jac_fp DESC, cn DESC, partner ASC) total tie order is PRESERVED
    * bit-for-bit by packing score = jac_fp·2⁴² + cn into one Long
    * (jac_fp ≤ 2²⁰ keeps the pack < 2⁶³; cn < 2⁴² is ENFORCED via max
    * distinct-customer degree — beyond 4×10¹² customers per supplier,
    * widen the pack); the prune is exact by the combiner argument
    * (every global top-K row is in its own partition's top-K).
    * Degrees re-join AFTER the top-K on the K·|suppliers| output, and
    * cn decodes from the score. */
  def coPurchaseTopK(s: SparkSession, d: String): DataFrame = {
    val fp = 1L << 20
    val packShift = 1L << 42
    val e = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()
      .persist()
    val deg = e.groupBy(col("sp").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // guard action + two re-joins read it
    val mdRow = deg.agg(max(col("deg"))).head()
    val maxDeg = if (mdRow.isNullAt(0)) 0L else mdRow.getLong(0)
    require(maxDeg < (1L << 42),
      s"coPurchaseTopK pack headroom: max supplier degree $maxDeg >= 2^42 " +
        "would collide cn with jac_fp in the packed score - widen the pack")
    val pairs = e.select(col("c"), col("sp").as("sa"))
      .join(e.select(col("c").as("c2"), col("sp").as("sb")),
        col("c") === col("c2") && col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("cn"))
    val both = pairs.select(col("sa").as("supplier"),
        col("sb").as("partner"), col("cn"))
      .unionByName(pairs.select(col("sb").as("supplier"),
        col("sa").as("partner"), col("cn")))
    val scored = both
      .join(deg.select(col("node").as("supplier"), col("deg").as("deg_s")),
        Seq("supplier"))
      .join(deg.select(col("node").as("partner"), col("deg").as("deg_p")),
        Seq("partner"))
      .withColumn("jac_fp", expr(s"(cn * $fp) div (deg_s + deg_p - cn)"))
      .withColumn("score", expr(s"jac_fp * $packShift + cn"))
    val pruned = graft.datapipe.TopK.localTopKPrune(
      scored.select(col("supplier"), col("score"), col("partner")),
      "supplier", "score", "partner", CoPurchaseK)
    val w = Window.partitionBy(col("supplier"))
      .orderBy(col("score").desc, col("partner"))
    val top = pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= CoPurchaseK)
      .select(col("supplier"), col("rank"), col("partner"),
        expr(s"score % $packShift").as("cn"),
        expr(s"score div $packShift").as("jac_fp"))
    val out = top
      .join(deg.select(col("node").as("supplier"), col("deg").as("deg_s")),
        Seq("supplier"))
      .join(deg.select(col("node").as("partner"), col("deg").as("deg_p")),
        Seq("partner"))
      .select(col("supplier"), col("rank"),
        col("partner"), col("cn"), col("deg_s"), col("deg_p"), col("jac_fp"))
      .orderBy(col("supplier"), col("rank"))
      .localCheckpoint(true) // materialize before unpersisting the shared scan
    e.unpersist()
    out
  }

  def coPurchaseOracle: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), deg AS MATERIALIZED (
       |  SELECT sp AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
       |), pairs AS MATERIALIZED (
       |  SELECT a.sp AS sa, b.sp AS sb, CAST(count(*) AS BIGINT) AS cn
       |  FROM e a JOIN e b ON b.c = a.c AND a.sp < b.sp GROUP BY 1, 2
       |), bi AS (
       |  SELECT sa AS supplier, sb AS partner, cn FROM pairs
       |  UNION ALL SELECT sb AS supplier, sa AS partner, cn FROM pairs
       |), scored AS (
       |  SELECT supplier, partner, cn, ds.deg AS deg_s, dp.deg AS deg_p,
       |    (cn * ${1L << 20}) // (ds.deg + dp.deg - cn) AS jac_fp
       |  FROM bi
       |  JOIN deg ds ON ds.node = supplier
       |  JOIN deg dp ON dp.node = partner
       |)
       |SELECT supplier, CAST(rank AS BIGINT) AS rank, partner, cn,
       |  deg_s, deg_p, jac_fp
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY supplier
       |    ORDER BY jac_fp DESC, cn DESC, partner) AS rank
       |  FROM scored
       |) WHERE rank <= $CoPurchaseK
       |ORDER BY supplier, rank""".stripMargin

  /** q149 walk length. */
  private val WalkSteps = 8

  /** Deterministic random-walk corpus (q149) over the purchase graph
    * — one 8-step hash-driven walk from every node, the DeepWalk
    * input a graph-embedding pipeline materializes; see
    * [[Graph.randomWalks]]. Emits (walk, step, node) with the
    * 'c:'/'s:' presentation ids. */
  def randomWalksQ(s: SparkSession, d: String): DataFrame =
    Graph.randomWalks(purchaseGraph(s, d), WalkSteps)
      .select(nodeStr("walk").as("walk_s"), col("step"),
        nodeStr("node").as("node_s"))
      .select(col("walk_s").as("walk"), col("step"),
        col("node_s").as("node"))
      .orderBy(col("walk"), col("step"))

  def randomWalksOracle: String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |), e AS MATERIALIZED (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
         |), adj AS MATERIALIZED (
         |  SELECT src, dst,
         |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS idx,
         |    CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg
         |  FROM e
         |), w0 AS MATERIALIZED (
         |  SELECT DISTINCT src AS walk, src AS node FROM e
         |)""".stripMargin
    for (t <- 1 to WalkSteps) sb ++=
      s""",
         | w$t AS MATERIALIZED (
         |  SELECT w.walk, a.dst AS node
         |  FROM w${t - 1} w JOIN adj a ON a.src = w.node
         |    AND a.idx = CAST('0x' || substr(md5(
         |      'w' || CAST(w.walk AS VARCHAR) || ':$t'), 1, 15) AS BIGINT) % a.deg
         |)""".stripMargin
    val unions = (0 to WalkSteps)
      .map(t => s"SELECT walk, CAST($t AS INTEGER) AS step, node FROM w$t")
      .mkString("\n  UNION ALL ")
    sb ++=
      s"""
         |SELECT
         |  CASE WHEN walk % 2 = 0 THEN 'c:' || CAST(walk // 2 AS VARCHAR)
         |       ELSE 's:' || CAST(walk // 2 AS VARCHAR) END AS walk,
         |  step,
         |  CASE WHEN node % 2 = 0 THEN 'c:' || CAST(node // 2 AS VARCHAR)
         |       ELSE 's:' || CAST(node // 2 AS VARCHAR) END AS node
         |FROM (
         |  $unions
         |) ORDER BY walk, step""".stripMargin
    sb.toString
  }

  private val PmiWindow = 4
  private val PmiTopK = 200

  /** Windowed co-occurrence PMI (q148): top-200 token pairs of the
    * document corpus by co-occurrence count within a 4-token forward
    * window, scored with Q16 fixed-point PMI — see
    * [[Cooccurrence.pmiPairs]] for the equi-join window plan and the
    * exact-integer log chain the oracle replays value-for-value. */
  def pmiCooc(s: SparkSession, d: String): DataFrame =
    Cooccurrence.pmiPairs(Tables.documents(s, d), PmiWindow, PmiTopK)

  def pmiOracle: String =
    s"""WITH tokd AS MATERIALIZED (
       |  SELECT doc_id, string_split_regex(lower(text), '${Tok.WS}') AS toks
       |  FROM documents
       |), tpos AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, toks[i + 1] AS tok FROM (
       |    SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM tokd
       |  ) WHERE toks[i + 1] <> ''
       |), ev AS MATERIALIZED (
       |  SELECT least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
       |  FROM tpos a JOIN tpos b ON b.doc_id = a.doc_id
       |    AND b.pos BETWEEN a.pos + 1 AND a.pos + $PmiWindow
       |), pc AS MATERIALIZED (
       |  SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_pair
       |  FROM ev GROUP BY t1, t2
       |), marg AS MATERIALIZED (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS m FROM (
       |    SELECT t1 AS tok FROM ev UNION ALL SELECT t2 AS tok FROM ev
       |  ) GROUP BY tok
       |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
       |topk AS MATERIALIZED (
       |  SELECT * FROM pc ORDER BY n_pair DESC, t1, t2 LIMIT $PmiTopK
       |), lv AS (
       |  SELECT n_pair AS v FROM topk
       |  UNION SELECT m FROM marg
       |  UNION SELECT n FROM tot
       |),
       |${FixedLogSql.logCtes()}
       |SELECT k.t1 AS tok_a, k.t2 AS tok_b, k.n_pair,
       |  ma.m AS n_a, mb.m AS n_b,
       |  lp.lg + ln.lg - la.lg - lb.lg AS pmi_q16
       |FROM topk k
       |JOIN marg ma ON ma.tok = k.t1
       |JOIN marg mb ON mb.tok = k.t2
       |JOIN llog lp ON lp.v = k.n_pair
       |JOIN llog la ON la.v = ma.m
       |JOIN llog lb ON lb.v = mb.m
       |JOIN llog ln ON ln.v = (SELECT n FROM tot)
       |ORDER BY n_pair DESC, tok_a, tok_b""".stripMargin

  /** Incremental triangle census (q150): the corpus-growth twin of
    * q145 — documents with doc_id above the halfway mark "arrive
    * later", so the near-dup edges incident to them are the delta
    * batch ([[Graph.triangleCensusInc]]: probe-the-delta
    * neighborhoods, dedupe the triple multiplicity, add counts). The
    * oracle is the ONE-SHOT q145 census SQL over the full corpus, so
    * the driver's hash compare IS the batch ≡ incremental proof (the
    * q133/q138 convention). At sf0.01 the only triangle's three edges
    * all live in the delta — the multiplicity-3 dedup path is
    * exercised by the artifact itself. */
  def triangleCensusIncQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v")).persist()
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    // u < v throughout, so v is the larger doc id of the pair
    val base = edges.filter(col("v") <= cut)
    val delta = edges.filter(col("v") > cut)
    val out = Graph.triangleCensusInc(Graph.triangleCensus(base), base, delta)
      .select(col("node").as("doc_id"), col("deg"), col("tri"), col("cc_fp"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    edges.unpersist()
    out
  }

  /** Graph card (q155): the one-page exact-integer structural summary
    * of the near-dup graph — the dedup-health dashboard row a corpus
    * pipeline recomputes per snapshot. Node/edge counts and degree
    * moments come off the q145 census (one aggregate);
    * wedges = Σ deg·(deg−1)/2 and the global clustering coefficient
    * 3·triangles·2²⁰ div wedges are closed forms of those moments;
    * component stats reuse the large-star/small-star components.
    * Every value is an exact integer, so the oracle (census CTE chain
    * + a recursive-CTE closure, the q55 pattern) replays the card
    * bit-for-bit. Output: (stat, val) rows. */
  def graphCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
      .localCheckpoint(true) // feeds census AND components
    val census = Graph.triangleCensus(edges)
    val st = census.agg(count(lit(1)).as("n"), max(col("deg")),
      sum(col("deg")), sum(col("deg") * col("deg")), sum(col("tri"))).head()
    val nNodes = st.getLong(0)
    def lv(i: Int): Long = if (nNodes == 0) 0L else st.getLong(i)
    val (degMax, degSum, degSq, triSum) = (lv(1), lv(2), lv(3), lv(4))
    val wedges = (degSq - degSum) / 2
    val triTotal = triSum / 3
    val comp = graft.datapipe.ConnectedComponents.components(edges)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)), max(col("sz"))).head()
    val (nComp, maxComp) =
      if (comp.isNullAt(1)) (0L, 0L) else (comp.getLong(0), comp.getLong(1))
    val rows = Seq(
      ("deg_max", degMax), ("deg_sq_sum", degSq), ("deg_sum", degSum),
      ("global_cc_fp",
        if (wedges > 0) 3L * triTotal * Graph.CcFp / wedges else 0L),
      ("max_component", maxComp), ("n_components", nComp),
      ("n_edges", degSum / 2), ("n_nodes", nNodes),
      ("triangles", triTotal), ("wedges", wedges))
    s.createDataFrame(rows).toDF("stat", "val").orderBy(col("stat"))
  }

  def graphCardOracle: String =
    s"""WITH RECURSIVE $censusCtes, dstat AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    COALESCE(MAX(deg), 0) AS deg_max,
       |    COALESCE(CAST(SUM(deg) AS BIGINT), 0) AS deg_sum,
       |    COALESCE(CAST(SUM(deg * deg) AS BIGINT), 0) AS deg_sq_sum
       |  FROM deg
       |), tstat AS (
       |  SELECT COALESCE(CAST(SUM(tri) AS BIGINT), 0) // 3 AS triangles
       |  FROM tcnt
       |), sym AS (
       |  SELECT u AS a, v AS b FROM ned
       |  UNION ALL SELECT v AS a, u AS b FROM ned
       |), reach(node, label) AS (
       |  SELECT node, node FROM deg
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN sym e ON e.a = r.node
       |), comp AS (
       |  SELECT node, MIN(label) AS component FROM reach GROUP BY node
       |), cstat AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
       |    COALESCE(MAX(sz), 0) AS max_component
       |  FROM (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
       |        FROM comp GROUP BY component)
       |)
       |SELECT stat, val FROM (
       |  SELECT 'deg_max' AS stat, deg_max AS val FROM dstat
       |  UNION ALL SELECT 'deg_sq_sum', deg_sq_sum FROM dstat
       |  UNION ALL SELECT 'deg_sum', deg_sum FROM dstat
       |  UNION ALL SELECT 'global_cc_fp',
       |    CASE WHEN (d.deg_sq_sum - d.deg_sum) // 2 > 0
       |      THEN (3 * t.triangles * ${Graph.CcFp})
       |        // ((d.deg_sq_sum - d.deg_sum) // 2)
       |      ELSE 0 END FROM dstat d, tstat t
       |  UNION ALL SELECT 'max_component', max_component FROM cstat
       |  UNION ALL SELECT 'n_components', n_components FROM cstat
       |  UNION ALL SELECT 'n_edges', deg_sum // 2 FROM dstat
       |  UNION ALL SELECT 'n_nodes', n_nodes FROM dstat
       |  UNION ALL SELECT 'triangles', triangles FROM tstat
       |  UNION ALL SELECT 'wedges', (deg_sq_sum - deg_sum) // 2 FROM dstat
       |) ORDER BY stat""".stripMargin

  /** q156 H-index rounds: bounds worst-case convergence; near-dup
    * graphs settle in a handful and `stable` certifies it. */
  private val CoreRounds = 16

  /** k-core decomposition of the verified near-dup graph (q156):
    * per-node core number via [[Graph.coreness]]'s synchronous
    * H-index iteration — the dedup-health complement to the q145
    * census (coreness ≥ k isolates the dense heart of a duplicate
    * family; degree and cc inflate on hub noise, core numbers
    * don't). Emits (doc_id, deg, coreness, stable); `stable` is the
    * convergence certificate (last round changed nothing — at which
    * point the value IS the core number). The edge build is the
    * 100 TB part and is exactly q13's; each of the $CoreRounds
    * rounds is one keyed join + one node-keyed window/agg against
    * the once-shuffled adjacency. */
  def corenessQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    Graph.coreness(edges, CoreRounds)
      .select(col("node").as("doc_id"), col("deg"), col("coreness"),
        col("stable"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the shared ned/deg chain, then all $CoreRounds H-index
    * rounds unrolled as MATERIALIZED CTEs (the q143 pattern): each
    * round re-sorts every node's neighbor values descending and
    * counts positions with value ≥ position. `stable` replays the
    * certificate as "round R vs round R−1 differs nowhere". */
  def corenessOracle: String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH $nedDegCtes, adj AS MATERIALIZED (
         |  SELECT u AS node, v AS nb FROM ned
         |  UNION ALL SELECT v AS node, u AS nb FROM ned
         |), c0 AS MATERIALIZED (
         |  SELECT node, deg AS val FROM deg
         |)""".stripMargin
    for (t <- 1 to CoreRounds) sb ++=
      s""",
         | c$t AS MATERIALIZED (
         |  SELECT node,
         |    CAST(sum(CASE WHEN val >= rn THEN 1 ELSE 0 END) AS BIGINT) AS val
         |  FROM (
         |    SELECT a.node, c.val,
         |      CAST(row_number() OVER (PARTITION BY a.node
         |        ORDER BY c.val DESC, a.nb) AS BIGINT) AS rn
         |    FROM adj a JOIN c${t - 1} c ON c.node = a.nb
         |  ) GROUP BY node
         |)""".stripMargin
    sb ++=
      s""",
         | chg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n
         |  FROM c$CoreRounds a JOIN c${CoreRounds - 1} b ON b.node = a.node
         |  WHERE b.val <> a.val
         |)
         |SELECT d.node AS doc_id, d.deg, c.val AS coreness,
         |  (SELECT n FROM chg) = 0 AS stable
         |FROM deg d JOIN c$CoreRounds c ON c.node = d.node
         |ORDER BY doc_id""".stripMargin
    sb.toString
  }

  /** Near-dup cluster quality card (q166): one row per connected
    * component of the verified near-dup graph — the decision table a
    * dedup pipeline consults before ACTING on transitive closure:
    * density 2²⁰ (a clique) means every member is pairwise-similar —
    * safe to auto-merge; low density on a big component is the
    * MinHash-transitivity chain failure (borderline pairs glued
    * end-to-end) that needs review, and the triangle count separates
    * "sparse but braided" from "pure chain". All exact integers:
    * (component = min doc_id, n_nodes, n_edges, triangles,
    * density_fp = 2·e·2²⁰ div (n·(n−1)), auto_merge = density ≡ 2²⁰).
    * Composition of the factored pieces: q13 edges → large-star/
    * small-star components → q145 census triangles — each already
    * oracle-pinned alone; this card is their join, so the oracle
    * (recursive-CTE closure + shared census chain) replays the whole
    * decision table. */
  def clusterQualityCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
      .localCheckpoint(true) // feeds components, edge counts, census
    clusterQuality(edges).orderBy(col("component"))
  }

  /** The card math over any unordered unique edge set — factored so
    * `ClusterQualitySpec` drives it on synthetic chains/cliques. */
  private[queries] def clusterQuality(edges: DataFrame): DataFrame = {
    val comp = graft.datapipe.ConnectedComponents.components(edges)
    val nodes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("n_nodes"))
    val ecnt = edges
      .join(comp.select(col("node").as("u"), col("component")), "u")
      .groupBy(col("component")).agg(count(lit(1)).as("n_edges"))
    val tri = Graph.triangleCensus(edges)
      .join(comp, Seq("node"))
      .groupBy(col("component"))
      .agg(expr("sum(tri) div 3").as("triangles"))
    nodes.join(ecnt, Seq("component"), "left")
      .join(tri, Seq("component"), "left")
      .select(col("component"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("density_fp", when(col("n_nodes") >= 2,
        expr(s"(2 * n_edges * ${Graph.CcFp}) div (n_nodes * (n_nodes - 1))"))
        .otherwise(lit(0L)))
      .withColumn("auto_merge", col("density_fp") === Graph.CcFp)
  }

  def clusterQualityOracle: String =
    s"""WITH RECURSIVE $censusCtes, sym AS (
       |  SELECT u AS a, v AS b FROM ned
       |  UNION ALL SELECT v AS a, u AS b FROM ned
       |), reach(node, label) AS (
       |  SELECT node, node FROM deg
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN sym e ON e.a = r.node
       |), comp AS MATERIALIZED (
       |  SELECT node, MIN(label) AS component FROM reach GROUP BY node
       |), nodes AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM comp GROUP BY 1
       |), ecnt AS (
       |  SELECT c.component, CAST(count(*) AS BIGINT) AS n_edges
       |  FROM ned e JOIN comp c ON c.node = e.u GROUP BY 1
       |), tcomp AS (
       |  SELECT c.component,
       |    CAST(COALESCE(SUM(t.tri), 0) // 3 AS BIGINT) AS triangles
       |  FROM comp c JOIN tcnt t ON t.node = c.node GROUP BY 1
       |)
       |SELECT n.component, n.n_nodes,
       |  COALESCE(e.n_edges, 0) AS n_edges,
       |  COALESCE(t.triangles, 0) AS triangles,
       |  CASE WHEN n.n_nodes >= 2
       |    THEN (2 * COALESCE(e.n_edges, 0) * ${Graph.CcFp})
       |      // (n.n_nodes * (n.n_nodes - 1))
       |    ELSE 0 END AS density_fp,
       |  CASE WHEN n.n_nodes >= 2
       |    THEN (2 * COALESCE(e.n_edges, 0) * ${Graph.CcFp})
       |      // (n.n_nodes * (n.n_nodes - 1))
       |    ELSE 0 END = ${Graph.CcFp} AS auto_merge
       |FROM nodes n
       |LEFT JOIN ecnt e ON e.component = n.component
       |LEFT JOIN tcomp t ON t.component = n.component
       |ORDER BY 1""".stripMargin

  /** Exact cross-source duplication matrix (q171): near-dup edge
    * counts per unordered source pair — the EXACT counterpart of
    * q154's KMV shingle-overlap ESTIMATES, answering the same
    * provenance question ("is src7 re-crawling src3?") from the
    * verified pair graph instead of sketches: an entry (a, b, n)
    * means n document pairs with Jaccard ≥ 0.5 straddle the two
    * sources (diagonal = within-source duplication). Also emits each
    * source's dup_rate: distinct docs of the source appearing in any
    * near-dup pair ×2²⁰ over the source's doc count — the per-feed
    * health number a crawler dashboard tracks. Two broadcast-sized
    * source joins on the edge relation; the rate is one distinct
    * count. Output: matrix rows (kind='pair', src_a ≤ src_b, n) ∪
    * rate rows (kind='rate', src, src, rate_fp). */
  def sourceDupMatrix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val src = docs.select(col("doc_id"), col("source"))
    val lab = edges
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n"))
      .select(lit("pair").as("kind"), col("src_a"), col("src_b"), col("n"))
    val dupDocs = edges.select(col("id_a").as("doc_id"))
      .unionByName(edges.select(col("id_b").as("doc_id"))).distinct()
      .join(src, "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup"))
    val rates = src.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(dupDocs, Seq("source"), "left")
      .select(lit("rate").as("kind"), col("source").as("src_a"),
        col("source").as("src_b"),
        expr(s"(coalesce(n_dup, 0) * ${Graph.CcFp}) div n_docs").as("n"))
    lab.unionByName(rates).orderBy(col("kind"), col("src_a"), col("src_b"))
  }

  def sourceDupMatrixOracle: String =
    s"""WITH $nedDegCtes, lab AS (
       |  SELECT 'pair' AS kind,
       |    least(da.source, db.source) AS src_a,
       |    greatest(da.source, db.source) AS src_b
       |  FROM ned e
       |  JOIN documents da ON da.doc_id = e.u
       |  JOIN documents db ON db.doc_id = e.v
       |), pairs_m AS (
       |  SELECT kind, src_a, src_b, CAST(count(*) AS BIGINT) AS n
       |  FROM lab GROUP BY 1, 2, 3
       |), dup_docs AS (
       |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_dup FROM (
       |    SELECT u AS doc_id FROM ned UNION SELECT v FROM ned
       |  ) x JOIN documents d ON d.doc_id = x.doc_id GROUP BY 1
       |), rates AS (
       |  SELECT 'rate' AS kind, d.source AS src_a, d.source AS src_b,
       |    (COALESCE(dd.n_dup, 0) * ${Graph.CcFp})
       |      // CAST(count(*) AS BIGINT) AS n
       |  FROM documents d LEFT JOIN dup_docs dd ON dd.source = d.source
       |  GROUP BY 1, 2, 3, dd.n_dup
       |)
       |SELECT kind, src_a, src_b, n FROM (
       |  SELECT * FROM pairs_m UNION ALL SELECT * FROM rates
       |) ORDER BY kind, src_a, src_b""".stripMargin

  /** Estimate fixed-point scale for q144: counts carry ×2¹⁰. */
  private val EstFp = 1024L

  /** ln(2) in Q16: floor(0.693147… · 2¹⁶). */
  private val Ln2Q16 = 45426L

  /** HyperLogLog distinct-count estimate (q144) over three keys of
    * very different cardinality — documents.doc_id (hundreds+: the
    * raw harmonic-mean branch), documents.lang and events.user_id
    * (small: the linear-counting branch) — so BOTH estimator branches
    * are driver-verified. Distributed part: [[Sketches.hllRegisters]]
    * (one md5 + bit ops per row, 64-group max, mergeable partial
    * agg). The estimate itself is 64-register driver math (bounded,
    * model-sized — the q137 convention) in EXACT integers:
    *
    *   S   = Σ_j 2^(55−M[j])                   (≤ 64·2⁵⁵ = 2⁶¹)
    *   raw = (709·m²·2⁵⁵·1024) / (1000·S)      (BigInt; α₆₄ = 709/1000)
    *   LC  = (m·(log2Fixed(⌊m·2²⁰/V⌋,16) − 20·2¹⁶)·45426·1024) / 2³²
    *   est = LC  if raw ≤ 160·1024 and V > 0, else raw
    *
    * Emits (key_name, slot, val): slots 0..63 the registers, 64 = V
    * (zero registers), 65 = S, 66 = the ×1024 estimate. The oracle
    * replays registers, branch choice, and both estimate paths
    * (HUGEINT for raw, the [[FixedLogSql]] chain for LC). */
  def hllDistinct(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ev = Tables.events(s, d)
    val regRows = Sketches.hllRegisters(docs, "doc_id", "doc_id")
      .unionByName(Sketches.hllRegisters(docs, "lang", "lang"))
      .unionByName(Sketches.hllRegisters(ev, "user_id", "user_id"))
      .collect() // bounded: <= 3 * 64 register rows (model-sized)
    val m = Sketches.HllM
    val labels = Seq("doc_id", "lang", "user_id")
    val byKey = regRows.groupBy(_.getString(0))
    val out = labels.flatMap { label =>
      val regs = Array.fill(m)(0L)
      byKey.getOrElse(label, Array.empty).foreach { r =>
        regs(r.getAs[Long]("idx").toInt) = r.getAs[Long]("m")
      }
      val v = regs.count(_ == 0L).toLong
      val sInt = regs.map(x => 1L << (Sketches.HllRhoMax - x)).sum
      val raw = (BigInt(709) * m * m * BigInt(1L << 55) * EstFp /
        (BigInt(1000) * sInt)).toLong
      val est =
        if (raw <= 160L * EstFp && v > 0) {
          val x = (m.toLong << 20) / v
          val lg = Log2FixedExpr.log2Fixed(x, 16) - (20L << 16)
          m * lg * Ln2Q16 * EstFp / (65536L * 65536L)
        } else raw
      regs.zipWithIndex.map { case (x, i) => (label, i, x) } ++
        Seq((label, m, v), (label, m + 1, sInt), (label, m + 2, est))
    }
    s.createDataFrame(out).toDF("key_name", "slot", "val")
      .select(col("key_name"), col("slot").cast("int").as("slot"), col("val"))
      .orderBy(col("key_name"), col("slot"))
  }

  /** q146 sketch size (the q56 convention). */
  private val SetK = 256

  /** The (pair, relA, relB) catalog for q146, as DuckDB source
    * relations producing one VARCHAR column `kk` — shared shape
    * between the Spark slices below and [[kmvSetOpsOracle]]. */
  private val setPairs = Seq(
    ("tok_src0_src1", "src0", "src1"),
    ("cust_1995_1996", "1995", "1996"),
    ("cust_1995_2001", "1995", "2001"))

  /** KMV set-operation estimates (q146): for three pairs of key sets
    * — the token vocabularies of two document sources (does src1 add
    * vocabulary over src0, or is it the same corpus resampled?) and
    * two pairs of customer-year cohorts (retention: how much of one
    * year's customer base is active in another) — estimate
    * |A∪B|, |A∩B| and Jaccard from the two KMV sketches
    * alone (Beyer et al., SIGMOD 2007): the k smallest hashes of
    * A∪B are a subset of sketchA ∪ sketchB (anything among the union's
    * k smallest is among its own set's k smallest), so the union
    * sketch needs NO second data pass, and ρ = |union-sketch ∩ A ∩
    * B|/k estimates the Jaccard. The distributed work is ONE pass per
    * table ([[Sketches.kmvSketchKeyed]] — keyed typed agg, O(k) state
    * per group, map-side partials); everything after is model-sized
    * driver math (≤ 6 arrays of 256 longs) in exact integers, ×2¹⁰
    * fixed point, truncating division — so the oracle replays every
    * estimate bit-for-bit (HUGEINT for the (k−1)·2⁶⁰·2¹⁰ numerator).
    * When a union sketch holds fewer than k hashes it IS the union
    * and every output is exact — the token pair (31-token synthetic
    * vocabulary) pins that branch while the year cohorts (≈1,200
    * customers each) pin the k-saturated estimator branch with real
    * partial overlap (J ≈ 0.64 and ≈ 0.5). */
  def kmvSetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val years = setPairs.collect {
      case (_, a, b) if !a.startsWith("src") => Seq(a.toInt, b.toInt) }
      .flatten.distinct
    val evSk = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(years: _*))
      .select(year(col("o_orderdate")).cast("string").as("slice"),
        Sketches.kmvHash(col("o_custkey")).as("h"))
      .as[(String, Long)].groupByKey(_._1)
      .agg(Sketches.kmvSketchKeyed(SetK).name("mins"))
      .collect().toMap // bounded: |years| rows x <= k longs
    val tokSk = Tables.documents(s, d)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"),
        explode(split(lower(col("text")), Tok.WS)).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("source"), Sketches.kmvHash(col("tok")).as("h"))
      .as[(String, Long)].groupByKey(_._1)
      .agg(Sketches.kmvSketchKeyed(SetK).name("mins"))
      .collect().toMap // bounded: 2 rows x <= k longs
    val rows = setPairs.map { case (label, a, b) =>
      val (ska, skb) =
        if (a.startsWith("src")) (tokSk(a), tokSk(b)) else (evSk(a), evSk(b))
      val (nU, kthU, nCommon, estU, estI, jac) =
        Sketches.kmvSetStats(ska, skb, SetK)
      (label, ska.length.toLong, skb.length.toLong, nU, kthU, nCommon,
        estU, estI, jac)
    }
    s.createDataFrame(rows).toDF("pair", "n_a", "n_b", "n_u", "kth_u",
      "n_common", "est_union_fp", "est_inter_fp", "jaccard_fp")
      .orderBy(col("pair"))
  }

  def kmvSetOpsOracle: String = {
    def rel(slice: String): String =
      if (slice.startsWith("src"))
        s"""(SELECT unnest(list_filter(string_split_regex(lower(text), '${graft.util.Tok.WS}'), t -> t <> '')) AS kk
           | FROM documents WHERE source = '$slice')""".stripMargin
      else
        s"""(SELECT CAST(o_custkey AS VARCHAR) AS kk FROM orders
           | WHERE year(o_orderdate) = $slice)""".stripMargin
    val blocks = setPairs.zipWithIndex.map { case ((label, a, b), i) =>
      s"""ska_$i AS MATERIALIZED (
         |  SELECT DISTINCT CAST('0x' || substr(md5(kk), 1, 15) AS BIGINT) AS h
         |  FROM ${rel(a)} ORDER BY h LIMIT $SetK
         |), skb_$i AS MATERIALIZED (
         |  SELECT DISTINCT CAST('0x' || substr(md5(kk), 1, 15) AS BIGINT) AS h
         |  FROM ${rel(b)} ORDER BY h LIMIT $SetK
         |), sku_$i AS MATERIALIZED (
         |  SELECT h FROM (SELECT h FROM ska_$i UNION SELECT h FROM skb_$i)
         |  ORDER BY h LIMIT $SetK
         |), st_$i AS (
         |  SELECT '$label' AS pair,
         |    (SELECT CAST(count(*) AS BIGINT) FROM ska_$i) AS n_a,
         |    (SELECT CAST(count(*) AS BIGINT) FROM skb_$i) AS n_b,
         |    (SELECT CAST(count(*) AS BIGINT) FROM sku_$i) AS n_u,
         |    (SELECT COALESCE(MAX(h), 0) FROM sku_$i) AS kth_u,
         |    (SELECT CAST(count(*) AS BIGINT) FROM sku_$i
         |     WHERE h IN (SELECT h FROM ska_$i)
         |       AND h IN (SELECT h FROM skb_$i)) AS n_common
         |), est_$i AS (
         |  SELECT *, CASE WHEN n_u < $SetK THEN n_u * $EstFp
         |    ELSE CAST((CAST(${SetK - 1} AS HUGEINT) * ${1L << 60} * $EstFp)
         |      // kth_u AS BIGINT) END AS est_union_fp
         |  FROM st_$i
         |), fin_$i AS (
         |  SELECT pair, n_a, n_b, n_u, kth_u, n_common, est_union_fp,
         |    CASE WHEN n_u < $SetK THEN n_common * $EstFp
         |      ELSE CAST((CAST(est_union_fp AS HUGEINT) * n_common)
         |        // $SetK AS BIGINT) END AS est_inter_fp,
         |    CASE WHEN n_u > 0 THEN (n_common * $EstFp) // n_u
         |      ELSE 0 END AS jaccard_fp
         |  FROM est_$i
         |)""".stripMargin
    }
    val unions = setPairs.indices.map(i => s"SELECT * FROM fin_$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${blocks.mkString(", ")}
       |$unions
       |ORDER BY pair""".stripMargin
  }

  /** Pairwise source-similarity matrix (q154): estimated shingle-set
    * Jaccard between EVERY pair of the 20 document sources — the
    * corpus-provenance card a curation pipeline keeps ("is src7 a
    * re-crawl of src3?"), and the generalization of q146 to the full
    * slice×slice matrix. 3-token shingle sets (the q13 convention, so
    * overlap means shared phrasing, not shared vocabulary) are
    * sketched in ONE pass with the keyed KMV aggregator — O(k) state
    * per source, the 190 pair estimates are model-sized driver math
    * ([[Sketches.kmvSetStats]], ≤ 20×256 longs collected). The oracle
    * recomputes the matrix RELATIONALLY (windowed k-smallest per
    * source, per-pair union rank, membership flags) — one generic SQL
    * statement, no per-pair unrolling. At bench scale every pair
    * saturates k, so all 190 rows run the HUGEINT estimator branch
    * with real partial overlaps. */
  def sourceSimilarityMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sk = Tables.documents(s, d)
      .select(col("source"),
        expr(s"filter(split(lower(text), '${Tok.WsSqlLit}'), t -> t != '')")
          .as("toks"))
      .select(col("source"), explode(expr(
        """CASE WHEN size(toks) < 3 THEN array(array_join(toks, ' '))
          |ELSE transform(sequence(1, size(toks) - 2),
          |  i -> array_join(slice(toks, i, 3), ' ')) END""".stripMargin))
        .as("sh"))
      .filter(col("sh") =!= "")
      .select(col("source"), Sketches.kmvHash(col("sh")).as("h"))
      .as[(String, Long)].groupByKey(_._1)
      .agg(Sketches.kmvSketchKeyed(SetK).name("mins"))
      .collect().toMap // bounded: n_sources x <= k longs
    val sources = sk.keys.toSeq.sorted
    val rows = for {
      i <- sources.indices
      j <- (i + 1) until sources.size
    } yield {
      val (sa, sb) = (sources(i), sources(j))
      val (nU, kthU, nCommon, estU, estI, jac) =
        Sketches.kmvSetStats(sk(sa), sk(sb), SetK)
      (sa, sb, nU, kthU, nCommon, estU, estI, jac)
    }
    s.createDataFrame(rows).toDF("src_a", "src_b", "n_u", "kth_u",
      "n_common", "est_union_fp", "est_inter_fp", "jaccard_fp")
      .orderBy(col("src_a"), col("src_b"))
  }

  def sourceSimilarityOracle: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT source,
       |    list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), shing AS MATERIALIZED (
       |  SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
       |  FROM (
       |    SELECT source, unnest(
       |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |        ELSE list_transform(range(1, len(toks) - 1),
       |          i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
       |    FROM toks
       |  ) WHERE sh <> ''
       |), sk AS MATERIALIZED (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM shing
       |  ) WHERE rn <= $SetK
       |), prs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM (SELECT DISTINCT source FROM sk) a
       |  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
       |), u AS MATERIALIZED (
       |  SELECT p.sa, p.sb, s.h,
       |    MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS ina,
       |    MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS inb
       |  FROM prs p JOIN sk s ON s.source = p.sa OR s.source = p.sb
       |  GROUP BY p.sa, p.sb, s.h
       |), uk AS (
       |  SELECT sa, sb, h, ina, inb,
       |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |  FROM u
       |), agg AS (
       |  SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_u, MAX(h) AS kth_u,
       |    CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
       |  FROM uk WHERE rn <= $SetK GROUP BY sa, sb
       |), est AS (
       |  SELECT *, CASE WHEN n_u < $SetK THEN n_u * ${Sketches.KmvEstFp}
       |    ELSE CAST((CAST(${SetK - 1} AS HUGEINT) * ${1L << 60} * ${Sketches.KmvEstFp})
       |      // kth_u AS BIGINT) END AS est_union_fp
       |  FROM agg
       |)
       |SELECT sa AS src_a, sb AS src_b, n_u, kth_u, n_common, est_union_fp,
       |  CASE WHEN n_u < $SetK THEN n_common * ${Sketches.KmvEstFp}
       |    ELSE CAST((CAST(est_union_fp AS HUGEINT) * n_common)
       |      // $SetK AS BIGINT) END AS est_inter_fp,
       |  CASE WHEN n_u > 0 THEN (n_common * ${Sketches.KmvEstFp}) // n_u
       |    ELSE 0 END AS jaccard_fp
       |FROM est ORDER BY src_a, src_b""".stripMargin

  def hllOracle: String = {
    val restMod = 1L << Sketches.HllRestBits // 2^54
    s"""WITH keys AS MATERIALIZED (
       |  SELECT 'doc_id' AS key_name, CAST(doc_id AS VARCHAR) AS k
       |  FROM documents WHERE doc_id IS NOT NULL
       |  UNION ALL SELECT 'lang', lang FROM documents WHERE lang IS NOT NULL
       |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR)
       |  FROM events WHERE user_id IS NOT NULL
       |), hh AS (
       |  SELECT key_name, CAST('0x' || substr(md5(k), 1, 15) AS BIGINT) AS h
       |  FROM keys
       |), rr AS (
       |  SELECT key_name, h // $restMod AS idx,
       |    CASE WHEN h % $restMod = 0 THEN ${Sketches.HllRhoMax}
       |         ELSE ${Sketches.HllRhoMax} - length(bin(h % $restMod)) END AS rho
       |  FROM hh
       |), regs AS MATERIALIZED (
       |  SELECT kn.key_name, g.j AS idx, COALESCE(mx.m, 0) AS m
       |  FROM (VALUES ('doc_id'), ('lang'), ('user_id')) kn(key_name)
       |  CROSS JOIN (SELECT unnest(range(${Sketches.HllM})) AS j) g
       |  LEFT JOIN (SELECT key_name, idx, MAX(rho) AS m FROM rr GROUP BY 1, 2) mx
       |    ON mx.key_name = kn.key_name AND mx.idx = g.j
       |), summ AS MATERIALIZED (
       |  SELECT key_name,
       |    CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v,
       |    CAST(SUM(CAST(1 AS BIGINT) << (${Sketches.HllRhoMax} - m)) AS BIGINT) AS s
       |  FROM regs GROUP BY 1
       |), lv AS (SELECT DISTINCT ${64L << 20} // v AS v FROM summ WHERE v > 0),
       |${FixedLogSql.logCtes()},
       |est AS (
       |  SELECT s.key_name, s.v, s.s,
       |    CAST((CAST(709 AS HUGEINT) * ${64 * 64} * ${1L << 55} * $EstFp)
       |      // (CAST(1000 AS HUGEINT) * s.s) AS BIGINT) AS raw
       |  FROM summ s
       |), fin AS (
       |  SELECT e.key_name, e.v, e.s,
       |    CASE WHEN e.raw <= ${160L * EstFp} AND e.v > 0
       |      THEN (64 * (l.lg - ${20L << 16}) * $Ln2Q16 * $EstFp)
       |        // ${65536L * 65536L}
       |      ELSE e.raw END AS est
       |  FROM est e LEFT JOIN llog l ON l.v = ${64L << 20} // NULLIF(e.v, 0)
       |)
       |SELECT key_name, CAST(slot AS INTEGER) AS slot, val FROM (
       |  SELECT key_name, CAST(idx AS BIGINT) AS slot, CAST(m AS BIGINT) AS val
       |  FROM regs
       |  UNION ALL SELECT key_name, 64, v FROM fin
       |  UNION ALL SELECT key_name, 65, s FROM fin
       |  UNION ALL SELECT key_name, 66, est FROM fin
       |) ORDER BY key_name, slot""".stripMargin
  }
}
