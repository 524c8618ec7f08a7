package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.datapipe.{Graph, PageRank, Sketches}
import graft.functions.Log2FixedExpr
import graft.util.Tables

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
  def pageRankQ(s: SparkSession, d: String): DataFrame = {
    // integer node ids throughout the iteration (customers even,
    // suppliers odd — disjoint without a dictionary); the 'c:'/'s:'
    // presentation strings exist only in the final projection. String
    // keys hashed/shuffled T times are the classic avoidable cost of
    // iterative graph jobs.
    val e0 = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    PageRank.pageRankFixed(sym, PrIters, broadcastRanks = true)
      .select(
        when(col("node") % 2 === 0,
          concat(lit("c:"), expr("node div 2").cast("string")))
          .otherwise(concat(lit("s:"), expr("node div 2").cast("string")))
          .as("node"),
        col("r").as("rank_fp"))
      .orderBy(col("node"))
  }

  /** The whole 16-step solve replayed in DuckDB: same symmetric edge
    * relation, same truncating `//` at every step (BIGINT throughout
    * — max intermediate ≈ 85·2⁴⁰ ≪ 2⁶³). MATERIALIZED per iterate:
    * each r_t is consumed by r_{t+1}'s join; without it the chain
    * re-inlines multiplicatively. */
  def pageRankOracle: String = {
    val fp = PageRank.Fp
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
         | r0 AS (SELECT src AS node, $fp // (SELECT n FROM nn) AS r FROM deg)""".stripMargin
    for (t <- 1 to PrIters) sb ++=
      s""",
         | r$t AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    (15 * $fp) // (100 * (SELECT n FROM nn)) +
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
    s"""WITH ${DataPipeQueries.minhashPairsCtes("documents")}, ned AS MATERIALIZED (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |), deg AS MATERIALIZED (
       |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS node FROM ned UNION ALL SELECT v FROM ned
       |  ) GROUP BY node
       |), orient AS MATERIALIZED (
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
       |)
       |SELECT d.node AS doc_id, d.deg, COALESCE(t.tri, 0) AS tri,
       |  CASE WHEN d.deg >= 2
       |    THEN (2 * COALESCE(t.tri, 0) * ${Graph.CcFp})
       |      // (d.deg * (d.deg - 1))
       |    ELSE 0 END AS cc_fp
       |FROM deg d LEFT JOIN tcnt t ON t.node = d.node
       |ORDER BY doc_id""".stripMargin

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
