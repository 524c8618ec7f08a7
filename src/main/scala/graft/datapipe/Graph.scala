package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle census + local clustering coefficients over an
  * undirected edge list — the structural-quality lens on similarity
  * graphs a curation pipeline builds anyway: a near-dup cluster whose
  * members are pairwise-similar (high clustering coefficient) is a
  * true duplicate family, while a low-coefficient component is a
  * CHAIN of borderline pairs glued by transitivity — exactly the
  * failure mode MinHash-threshold dedup is known for. Same census
  * powers spam/SEO-farm detection on link graphs.
  *
  * Algorithm: degree orientation (Chiba–Nishizeki / the standard
  * MapReduce formulation, e.g. Suri & Vassilvitskii WWW'11): direct
  * every edge from its (deg, id)-smaller endpoint to the larger, so
  * the out-degree of ANY node — however hot — is O(√m), wedge
  * generation is Σ C(outdeg, 2) ≤ O(m^1.5) TOTAL with no single-key
  * hot spot (the classic reason this survives power-law graphs at
  * 100 TB where a naive "join on shared neighbor" explodes on the
  * head vertex), and each triangle is generated exactly once (at its
  * orientation-minimal vertex). Every step is a keyed equi-join or
  * aggregation — no cartesian, no driver state.
  */
object Graph {

  /** Clustering-coefficient fixed-point scale: ×2²⁰. */
  val CcFp: Long = 1L << 20

  /** Per-node (node, deg, tri, cc_fp) for every endpoint of `edges0`
    * — (u, v) unordered unique pairs, u ≠ v. `tri` counts triangles
    * through the node; `cc_fp` = (2·tri·2²⁰) div (deg·(deg−1))
    * (truncating integer division — engine-replayable), 0 for
    * deg < 2. */
  def triangleCensus(edges0: DataFrame): DataFrame = {
    // normalize to u < v once; input may carry either orientation
    val edges = edges0
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist()
    // orient by (deg, id): two keyed joins against the node-sized
    // degree relation, then a projection — the oriented relation is
    // exactly one row per input edge
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
      .persist()
    oriented.count()
    // wedges at each orientation-minimal vertex, closed against the
    // unordered edge set: both joins are keyed (src; then the (u,v)
    // composite), so AQE sizes the shuffles off the real wedge count
    val w1 = oriented.select(col("src"), col("dst").as("b"))
    val w2 = oriented.select(col("src"), col("dst").as("c"))
    val tri = w1.join(w2, "src").filter(col("b") < col("c"))
      .join(edges, col("u") === col("b") && col("v") === col("c"))
      .select(col("src").as("a"), col("b"), col("c"))
    val tcnt = tri.select(col("a").as("node"))
      .unionByName(tri.select(col("b").as("node")))
      .unionByName(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    val out = deg.join(tcnt, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .select(col("node"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          expr(s"(2 * tri * $CcFp) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_fp"))
      // node-sized: materialize so the persisted inputs can be freed
      .localCheckpoint(true)
    edges.unpersist(); deg.unpersist(); oriented.unpersist()
    out
  }
}
