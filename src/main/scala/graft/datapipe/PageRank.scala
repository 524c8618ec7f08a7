package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer fixed-point PageRank (Brin & Page 1998) — graph
  * authority scoring for curation pipelines (CommonCrawl-style domain
  * ranking feeds quality filters and sampling weights at 100 TB).
  *
  * Every arithmetic step is integer with truncating division, so a
  * second engine replays the whole T-iteration solve bit-for-bit
  * (q143 unrolls it as T MATERIALIZED CTEs in DuckDB — the q137
  * pattern, but with the iteration state NODE-sized rather than
  * model-sized, so unlike the eigensolves the iteration itself stays
  * DISTRIBUTED: each step is one join + one aggregation, the classic
  * Pregel-without-Pregel shape).
  *
  * Fixed point: ranks carry ×2⁴⁰. At 10⁹ nodes a rank still has
  * ~2³⁰/node of resolution (2²⁰ would underflow to 0 — the scale
  * consideration that fixed the constant). Update rule per node v:
  *
  *   R'(v) = (15·2⁴⁰) div (100·N) + (85 · Σ_{u→v} R(u) div deg(u)) div 100
  *
  * all in BIGINT (max intermediate ≈ 85·2⁴⁰ ≪ 2⁶³). Caller provides
  * an edge relation where EVERY node has out-degree ≥ 1 (e.g. by
  * symmetrizing, as q143 does) — this removes the dangling-mass term
  * and keeps the recurrence purely local. Callers should use COMPACT
  * integer node ids (dictionary-encode once, decode once at the end):
  * shuffling and hash-joining long string keys T times is the classic
  * avoidable cost of iterative graph jobs.
  *
  * Plan shape per iteration: the degree column is folded into the
  * persisted edge relation ONCE, so an iteration is exactly
  * edges ⋈ ranks → project (r div deg) → groupBy(dst) sum — one
  * shuffle of node-sized data. With `broadcastRanks` the join side
  * is broadcast (right at domain-graph scale: ~1e7 nodes vs ~1e11
  * edges) and the edge relation is never re-partitioned at all;
  * without it, edges are hash-partitioned by src once and every
  * iteration's join reuses that layout (the 1e9-node-safe shape).
  * Each iterate is materialized (eager localCheckpoint) — lineage
  * depth stays 1, nothing re-executes, and on a real cluster the
  * same barrier is where reliable checkpointing would go.
  */
object PageRank {

  /** Rank fixed-point scale: ×2⁴⁰. */
  val Fp: Long = 1L << 40

  /** Damping d = 85/100, as an exact rational. */
  val DampNum = 85L
  val DampDen = 100L

  /** Run `iters` exact-integer PageRank steps over `edges` (columns
    * `src`, `dst`; every node must appear as a `src`). Returns
    * (node, r) with r the ×2⁴⁰ fixed-point rank.
    *
    * `seeds` non-empty switches to PERSONALIZED PageRank (Jeh &
    * Widom 2003): the teleport mass lands only on the seed set
    * ((15·2⁴⁰) div (100·|S|) per seed instead of a per-node share)
    * and the walk starts there — the result ranks nodes by proximity
    * to the seeds (graph-based retrieval / recommendation), not
    * global authority. Nodes the walk hasn't reached carry rank 0
    * rather than being dropped: the output stays one row per node,
    * same as the global variant. The seed list is driver-known and
    * tiny (an `isin` literal — codegen'd, no join). */
  def pageRankFixed(edges0: DataFrame, iters: Int,
      broadcastRanks: Boolean = false,
      seeds: Seq[Long] = Nil,
      materializeEvery: Int = 1): DataFrame = {
    // measured (sf0.1, local[32], warm): materializeEvery=4 runs ~10%
    // SLOWER than 1 (6.5 s vs 5.9 s for 16 iterations) — fusing k
    // steps makes each broadcast build execute a k-deep join-agg plan,
    // which costs more than the saved barrier writes. The classic
    // per-step Pregel barrier is the right default; the knob stays for
    // cluster-profile experiments where barrier cost dominates.
    require(materializeEvery >= 1)
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = edges0.sparkSession
    // materialize the input once: both the degree aggregation and the
    // deg-folded edge build read it (without this the upstream build —
    // typically a join+distinct — executes twice)
    val raw = edges0.select(col("src"), col("dst")).persist()
    val nEdges = raw.count()
    require(nEdges > 0, "pageRankFixed needs a non-empty graph")
    // partition count ∝ edge volume (compact 3-long rows → ~250k rows
    // per task keeps task-scheduling overhead below the work; capped
    // at the session's parallelism — at cluster scale the cap, i.e.
    // total cores, governs and AQE re-coalesces after each shuffle)
    val nPart = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (nEdges / 250000L).toInt + 1))
    val pre = raw
    val deg = pre.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    val n = deg.count()
    // deg folded into the edge relation once: iterations never join it
    // broadcast path: free layout, sized round-robin; co-partitioned
    // path: MUST stay hash-partitioned by src (the layout every
    // iteration's join reuses), so re-key on src with the sized count
    val edges = {
      val folded = pre
        .join(if (broadcastRanks) broadcast(deg) else deg, "src")
        .select(col("src"), col("dst"), col("deg"))
      (if (broadcastRanks) folded.repartition(nPart)
       else folded.repartition(nPart, col("src"))).persist()
    }
    edges.count()
    raw.unpersist()
    // teleport term: uniform for global PageRank, seed-only for PPR
    val baseCol =
      if (seeds.isEmpty) lit((15L * Fp) / (DampDen * n))
      else when(col("dst").isin(seeds: _*),
        lit((15L * Fp) / (DampDen * seeds.length))).otherwise(lit(0L))
    val r0 =
      if (seeds.isEmpty) deg.select(col("src").as("node"), lit(Fp / n).as("r"))
      else deg.select(col("src").as("node"),
        when(col("src").isin(seeds: _*), lit(Fp / seeds.length))
          .otherwise(lit(0L)).as("r"))
    var ranks = r0.localCheckpoint(true)
    for (t <- 1 to iters) {
      val rside = if (broadcastRanks) broadcast(ranks) else ranks
      val next = edges.join(rside, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst"))
        .agg((baseCol + expr(s"($DampNum * sum(c)) div $DampDen")).as("r"))
        .select(col("dst").as("node"), col("r"))
      // materialization barrier: lineage depth capped at
      // `materializeEvery` (1 = the classic per-step Pregel barrier;
      // small k trades barrier latency for a k-deep fused plan)
      ranks = if (t % materializeEvery == 0 || t == iters)
        next.localCheckpoint(true) else next
    }
    deg.unpersist()
    edges.unpersist()
    ranks
  }
}
