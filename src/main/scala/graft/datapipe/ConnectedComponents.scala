package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star rounds (the MapReduce CC algorithm of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * transitive-closure companion to the pairwise dedup operators:
  * near-dup PAIRS become near-dup CLUSTERS, and the canonical survivor
  * of a cluster is its minimum id, even when similarity is only
  * pairwise-chained (a~b, b~c, a!~c).
  *
  * Scale notes (100 TB): converges in O(log n) rounds (each round is
  * one groupBy shuffle of the edge list); state per round is the edge
  * set itself, which only shrinks toward the star graph — no
  * driver-side union-find, no vertex-indexed state. Convergence is
  * detected by edge-set stability (count + canonical checksum, two
  * cheap aggregates per round).
  */
object ConnectedComponents {

  private def bidirect(e: DataFrame): DataFrame =
    e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))

  /** Large-star: every node links its strictly-larger neighbors to the
    * minimum of its neighborhood (incl. itself). */
  private def largeStar(e: DataFrame): DataFrame =
    bidirect(e)
      .groupBy(col("u")).agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"), least(col("u"), array_min(col("nbrs"))).as("m"),
        explode(col("nbrs")).as("v"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()

  /** Small-star: every node links its smaller-or-equal neighbors and
    * itself to the minimum of that set. */
  private def smallStar(e: DataFrame): DataFrame = {
    val smaller = bidirect(e).filter(col("v") < col("u"))
    smaller
      .groupBy(col("u")).agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"), array_min(col("nbrs")).as("m"), col("nbrs"))
      .select(col("m"), explode(concat(col("nbrs"), array(col("u")))).as("v"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Component assignment for every node appearing in `edges`
    * (columns (u, v), Long ids): returns (node, component) where
    * component = the minimum id in the node's connected component.
    * Root nodes map to themselves.
    *
    * Hybrid execution: below `driverThreshold` edges the graph is
    * collected and solved with a single-pass union-find — O(E α(E))
    * on one core beats O(log n) rounds of cluster-wide shuffles by an
    * order of magnitude for small edge sets (near-dup graphs are tiny
    * relative to their corpus: edges ≈ duplicates, not documents).
    * Above the threshold the alternating star rounds run distributed.
    * Both paths are spec-equal; pass driverThreshold = 0 to force the
    * distributed path. */
  def components(edges: DataFrame, maxIter: Int = 25,
      driverThreshold: Long = 2000000L): DataFrame = {
    // Materialize the canonical edge set once: BOTH paths evaluate it
    // at least twice (the size probe + either the driver collect or
    // the first star round), and callers routinely pass edge sets
    // derived from expensive chains (minhash banding, cosine pair
    // search) — without a cut each evaluation re-executes that chain.
    var e = edges.select(col("u").cast("long"), col("v").cast("long"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val nEdges = e.count()
    if (nEdges <= driverThreshold) return unionFindLocal(e)
    var converged = false
    var iter = 0
    // fingerprint = (count, xor-ish checksum) of the canonical edge set:
    // equal fingerprints on a shrinking-or-stable set ⇒ fixpoint
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df
        .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
        .agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var fp = fingerprint(e)
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      e = next
      iter += 1
    }
    // Convergence is O(log n) rounds; exhausting maxIter without a
    // stable fingerprint means the edge set is NOT a star forest and
    // the assignments below would be silently wrong — fail loudly.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge after $maxIter rounds " +
          s"($nEdges input edges); raise maxIter or inspect the edge set")
    // after convergence the edge set is a star forest: (u, root)
    val stars = e.select(greatest(col("u"), col("v")).as("node"),
      least(col("u"), col("v")).as("component"))
    val roots = stars.select(col("component").as("node"),
      col("component")).distinct()
    stars.union(roots).distinct()
  }

  /** Driver union-find for the small-graph fast path: collect the edge
    * list (bounded by driverThreshold ≈ 32 MB), solve, parallelize the
    * (node → min-root) assignment back out. */
  private def unionFindLocal(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
    nodes.map(x => (x, find(x))).toSeq.toDF("node", "component")
  }

  /** Components over a node table: nodes without any edge become
    * singleton components (component = own id). */
  def componentsWithSingletons(nodes: DataFrame, idCol: String,
      edges: DataFrame): DataFrame = {
    val comp = components(edges)
    nodes.select(col(idCol).as("node"))
      .join(comp, Seq("node"), "left_outer")
      .select(col("node").as(idCol),
        coalesce(col("component"), col("node")).as("component"))
  }
}
