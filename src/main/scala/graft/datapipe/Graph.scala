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

  /** Volume-derived partition count for a persisted per-iteration
    * relation (the [[PageRank]] nPart convention, round 18 applied
    * family-wide): ~250k compact rows per task keeps task-scheduling
    * overhead below the work, capped at the session's parallelism —
    * at cluster scale the cap (total cores) governs, locally a small
    * relation stops inheriting `shuffle.partitions = cpus` wholesale,
    * which made every iteration pay `cpus` near-empty tasks per job
    * (measured r18: the q149 step loop ran 0.55 s/step at 32 cores vs
    * 0.21 s/step at 8 BECAUSE of those empty tasks; sized, both run
    * ~0.19 s/step — the 32-core anti-scaling of the iterative family
    * was exactly this). */
  private[graft] def sizedParts(df: DataFrame, nRows: Long): Int =
    math.max(1, math.min(df.sparkSession.sparkContext.defaultParallelism,
      (nRows / 250000L).toInt + 1))

  /** Both orientations of an edge relation in ONE pass:
    * explode([struct(a,b), struct(b,a)]) instead of
    * `df.unionByName(df.reversed)` — the union form executes the
    * (typically unpersisted) upstream subtree TWICE, which for edge
    * relations built from a join+distinct or a whole LSH chain doubles
    * the expensive part of the query (measured round 17: the
    * purchase-graph build and q156/q175's minhash chain each ran 2×).
    * Row set and order semantics are identical to the union form. */
  private[graft] def mirrored(df: DataFrame, a: String, b: String): DataFrame =
    df.select(explode(array(
      struct(col(a).as(a), col(b).as(b)),
      struct(col(b).as(a), col(a).as(b)))).as("__e"))
      .select(col(s"__e.$a").as(a), col(s"__e.$b").as(b))

  /** Incremental [[triangleCensus]]: update a prior census when a
    * batch of NEW edges arrives (corpus growth — new documents add
    * near-dup edges incident to them; existing pairs never change).
    * Work is proportional to the DELTA's neighborhoods, not the
    * graph: new triangles can only contain a new edge, so they are
    * found by probing the (persisted, at scale bucketed-by-endpoint)
    * adjacency with the delta — two keyed joins per new edge — and
    * deduplicating the triple set (a triangle with 2–3 new edges is
    * discovered once per new edge; `distinct` on the sorted triple
    * removes the multiplicity exactly). Degrees add; coefficients
    * recompute from the closed-form counts. Batch ≡ incremental is
    * pinned by the driver oracle: q150 replays the ONE-SHOT census
    * SQL over the full edge set and the hash compare proves this
    * delta path lands on identical bytes.
    *
    * `baseCensus` is the prior (node, deg, tri, cc_fp) output;
    * `baseEdges`/`newEdges` are unordered unique (u, v) pairs with
    * `newEdges` disjoint from `baseEdges`. */
  /** The updated census rows for ONLY the nodes the delta touches
    * (endpoints of new edges, plus third corners of new triangles) —
    * what a streaming state store appends per batch so its write is
    * ∝ delta, never ∝ nodes. Same probe-the-delta algorithm as
    * [[triangleCensusInc]]; that full-output face is delta ∪
    * untouched base rows. */
  def triangleCensusDelta(baseCensus: DataFrame, baseEdges: DataFrame,
      newEdges: DataFrame): DataFrame = {
    val norm = (df: DataFrame) => df
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val nw = norm(newEdges).persist()
    val all = norm(baseEdges).unionByName(nw).persist()
    // symmetric adjacency of the UPDATED graph (the persisted graph
    // store at scale; the union here stands in for its post-append
    // state)
    val adj = all.select(col("u").as("a"), col("v").as("b"))
      .unionByName(all.select(col("v").as("a"), col("u").as("b")))
    // common-neighbor probe per new edge: w adjacent to BOTH endpoints
    val newTris = nw
      .join(adj.select(col("a").as("u"), col("b").as("w1")), "u")
      .join(adj.select(col("a").as("v"), col("b").as("w2")), "v")
      .filter(col("w1") === col("w2"))
      .select(array_sort(array(col("u"), col("v"), col("w1"))).as("t"))
      .distinct() // multiplicity = #new edges in the triangle
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
    val dTri = newTris.select(col("a").as("node"))
      .unionByName(newTris.select(col("b").as("node")))
      .unionByName(newTris.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d_tri"))
    val dDeg = nw.select(col("u").as("node"))
      .unionByName(nw.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d_deg"))
    val touched = dDeg.select(col("node"))
      .unionByName(dTri.select(col("node"))).distinct()
    val out = touched
      .join(baseCensus.select(col("node"), col("deg"), col("tri")),
        Seq("node"), "left")
      .join(dDeg, Seq("node"), "left")
      .join(dTri, Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("deg"), lit(0L)) + coalesce(col("d_deg"), lit(0L)))
          .as("deg"),
        (coalesce(col("tri"), lit(0L)) + coalesce(col("d_tri"), lit(0L)))
          .as("tri"))
      .select(col("node"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          expr(s"(2 * tri * $CcFp) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_fp"))
      .localCheckpoint(true)
    nw.unpersist(); all.unpersist()
    out
  }

  def triangleCensusInc(baseCensus: DataFrame, baseEdges: DataFrame,
      newEdges: DataFrame): DataFrame = {
    val delta = triangleCensusDelta(baseCensus, baseEdges, newEdges)
    baseCensus
      .join(delta.select(col("node")), Seq("node"), "left_anti")
      .unionByName(delta)
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with self-
    * retention, fully deterministic: every node starts labeled with
    * its own id; each step relabels v to the label with the highest
    * count among v's neighbors PLUS v's own current label (the
    * self-vote dampens the bipartite 2-cycle oscillation synchronous
    * LPA is known for), ties broken toward the SMALLEST label — so
    * the whole run is a pure function of the edge set and any engine
    * replays it step for step.
    *
    * Plan per iteration (the q143 shape): edges ⋈ labels is a keyed
    * join against the once-partitioned edge relation, label counting
    * is a partial-agg groupBy, and the argmax is `max_by` over a
    * (count, −label) struct — one more node-sized shuffle, no window
    * over raw data. State between iterations is one (node, label)
    * row per node, eagerly materialized (lineage depth 1). Iterations
    * move node-sized data only; the edge relation never re-shuffles.
    *
    * `edges` must be symmetric (u→v and v→u both present). Returns
    * (node, label). */
  def labelPropagation(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val raw = edges0.select(col("src"), col("dst")).persist()
    val nEdges = raw.count()
    // volume-sized, src-keyed layout: every iteration's join reuses it
    // (the PageRank convention; upstream partitioning was cpus-sized)
    val edges = raw
      .repartition(sizedParts(raw, nEdges), col("src")).persist()
    edges.count()
    raw.unpersist()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = edges.join(labels, col("src") === col("node"))
        .select(col("dst"), col("label"))
        .unionByName(labels.select(col("node").as("dst"), col("label")))
      // ONE dst-keyed exchange per iteration (round 18): hash(dst)
      // satisfies the clustering of BOTH the (dst, label) count and
      // the per-dst argmax, so the explicit repartition replaces the
      // two chained agg exchanges ((dst,label) then dst) with one —
      // measured 4.6 → 3.4 s at 32 cores, 4.1 → 3.6 s at 8.
      labels = votes
        .repartition(sizedParts(edges, nEdges), col("dst"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max_by(col("label"),
          struct(col("cnt"), (-col("label")).as("neg"))).as("label"))
        .select(col("dst").as("node"), col("label"))
        .localCheckpoint(true)
    }
    edges.unpersist()
    labels
  }

  /** Deterministic random-walk corpus (the DeepWalk / node2vec(p=q=1)
    * input: Perozzi et al. 2014) — one `steps`-step walk started at
    * EVERY node, with the "random" neighbor choice derived from a
    * portable hash instead of an RNG: at step t the walk at node v
    * moves to neighbor number  md5("w<walk>:<t>") mod deg(v)  under a
    * fixed neighbor numbering (row_number by dst within src). The
    * whole corpus is therefore a pure function of the edge set — same
    * result on any engine, any partitioning, any rerun (the property
    * that makes walk corpora cacheable and incremental at 100 TB,
    * and lets DuckDB replay every step).
    *
    * Plan: the indexed adjacency (edge + idx + deg folded in) is
    * built ONCE with a src-keyed window and persisted; each step is
    * walk-state ⋈ adjacency on the composite (node, selected-index)
    * key — walk-state is node-sized, the adjacency never re-shuffles,
    * and the hash/mod arithmetic is codegen'd column work. State
    * between steps is eagerly materialized (lineage depth 1).
    * Returns (walk, step, node): walk = start node id, step 0..steps.
    */
  def randomWalks(edges0: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1: $steps")
    import org.apache.spark.sql.expressions.Window
    val edges = edges0.select(col("src"), col("dst")).persist()
    val nEdges = edges.count()
    // neighbor numbering + out-degree, one shuffle, persisted for all
    // steps. Volume-sized src partitioning (round 18): the window
    // establishes the src hash layout ONCE at a task count derived
    // from the edge volume, and every step's join + state checkpoint
    // then runs that many tasks instead of `cpus` near-empty ones.
    val adj = edges
      .repartition(sizedParts(edges, nEdges), col("src"))
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("src")).orderBy(col("dst")))
          .cast("long") - 1L)
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy(col("src"))))
      .persist()
    adj.count()
    edges.unpersist()
    var state = adj.select(col("src").as("walk"), col("src").as("node"))
      .distinct().localCheckpoint(true)
    val frames = scala.collection.mutable.ArrayBuffer(
      state.select(col("walk"), lit(0).as("step"), col("node")))
    for (t <- 1 to steps) {
      val sel = Sketches.kmvHash(
        concat(lit("w"), col("walk").cast("string"), lit(s":$t")))
      // evaluate the md5-based selector hash ONCE PER WALK in the
      // state projection, not inside the join predicate: the previous
      // form put `idx === kmvHash(...) % deg` in the join condition,
      // where it ran per MATCHED ADJACENCY ROW — deg(v) md5 evals per
      // walk per step (per edge at cluster scale). The join stays a
      // single src-keyed probe with a cheap integer-mod post-filter.
      // Same selection arithmetic, same rows.
      val state2 = state.select(col("walk"), col("node"),
        sel.as("__sel"))
      state = state2
        .join(adj, col("node") === col("src") &&
          col("idx") === col("__sel") % col("deg"))
        .select(col("walk"), col("dst").as("node"))
        .localCheckpoint(true)
      frames += state.select(col("walk"), lit(t).as("step"), col("node"))
    }
    val out = frames.reduce(_ unionByName _)
    adj.unpersist()
    out
  }

  /** k-core decomposition via synchronous H-index iteration (Lü,
    * Zhou, Zhang & Stanley, Nature Communications 2016: iterating
    * "my value ← H-index of my neighbors' values" from the degree
    * converges to the coreness of every node). Coreness is the
    * curation lens the triangle census can't give: a node's core
    * number is robust to individual edge noise (one spurious
    * near-dup edge can't raise it), so "coreness ≥ k" isolates the
    * DENSE heart of a duplicate family while degree and even local
    * clustering get inflated by hub noise — the standard "nested
    * density" summary on similarity and link graphs.
    *
    * Why H-index iteration rather than the textbook sequential peel
    * (Batagelj–Zaveršnik): peeling removes ONE minimum-degree node at
    * a time — inherently serial, impossible at 10⁹ nodes. The
    * H-operator form is embarrassingly parallel (every node updates
    * from its neighbors only), monotone non-increasing, and exact at
    * convergence — the shape that runs as `rounds` keyed join+agg
    * passes on any cluster. Determinism: synchronous rounds from a
    * deterministic start (degrees), so the full trajectory — not just
    * the fixpoint — is a pure function of the edge set, and the
    * oracle (q156) replays all `rounds` rounds as unrolled CTEs.
    *
    * Per round, per node: H-index of neighbor values = |{i : vᵢ ≥ i}|
    * with neighbor values v₁ ≥ v₂ ≥ … (the predicate is prefix-closed
    * under the descending sort, so a count equals the max index).
    * Plan per round: values ⋈ adjacency (keyed join against the
    * once-built, persisted symmetric adjacency — edge-sized relation
    * never re-shuffles), then a node-keyed `row_number` window and a
    * conditional count — the window and the aggregation share the
    * node partitioning, so one round moves edge-sized data once.
    * State between rounds is one (node, val) row per node, eagerly
    * materialized (lineage depth 1, the q143/q147 convention).
    *
    * Returns (node, deg, coreness = the round-`rounds` value, and
    * `stable` = whether the last round changed nothing — the
    * convergence certificate; at convergence `coreness` IS the core
    * number). `rounds` bounds worst-case convergence (path graphs
    * need O(diameter)); near-dup graphs converge in a handful —
    * `CorenessSpec` pins `stable = true` at both bench scales and
    * ties the fixpoint to the exact sequential peel on generated
    * graphs. Edges: unordered unique (u, v), u ≠ v, either
    * orientation. */
  def coreness(edges0: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    import org.apache.spark.sql.expressions.Window
    val edges = edges0
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val adj0 = mirrored(edges, "u", "v")
      .select(col("u").as("node"), col("v").as("nb"))
      .persist()
    val nAdj = adj0.count()
    // volume-sized, node-keyed layout (round 18): the per-round window
    // and H-count aggregation are both node-clustered, so hash-laying
    // the persisted adjacency out by node at a task count derived from
    // its volume removes every per-round exchange AND the cpus-sized
    // empty-task floor (the join side `vals` is node-sized and
    // broadcast by AQE, which preserves this partitioning).
    val adj = adj0
      .repartition(sizedParts(adj0, nAdj), col("node")).persist()
    adj.count()
    adj0.unpersist()
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var vals = deg.select(col("node"), col("deg").as("val"))
    var prev: DataFrame = null
    for (_ <- 1 to rounds) {
      prev = vals
      val nbVals = adj.join(
        vals.select(col("node").as("nb"), col("val")), "nb")
      // ties in `val` are rank-order-invariant for the H-count (the
      // rn block a tied group occupies is fixed); nb tiebreak keeps
      // the intermediate fully deterministic anyway
      vals = nbVals
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("node"))
            .orderBy(col("val").desc, col("nb"))).cast("long"))
        .groupBy(col("node"))
        .agg(sum(when(col("val") >= col("rn"), 1L).otherwise(0L)).as("val"))
        .localCheckpoint(true)
    }
    // convergence certificate: one node-sized join; `stable` is a
    // global flag computed without collecting (broadcast 1-row count)
    val changed = vals.join(prev.select(col("node"), col("val").as("pv")),
      "node").filter(col("val") =!= col("pv")).count()
    val out = deg.join(vals, "node")
      .select(col("node"), col("deg"), col("val").as("coreness"),
        lit(changed == 0L).as("stable"))
    adj.unpersist()
    out
  }

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
