package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic distributed k-means (Lloyd) over embedding columns —
  * the clustering stage of a semantic-dedup / domain-discovery
  * pipeline (SemDeDup, Abbas et al. 2023: cluster the corpus, then
  * near-dup only WITHIN a cluster).
  *
  * Everything is computed in fixed point so the result is bit-exact
  * on any engine, any partitioning, any run:
  *
  *  - vectors quantize to Long components (floor(x·2²⁰) — float→
  *    double widening and a power-of-two scale are both exact, so
  *    Spark and an SQL oracle agree on every quantized component);
  *  - distances are integer sums of squared component diffs (no float
  *    accumulation order to drift);
  *  - centroid updates are exact Long sums + floor division
  *    (`Math.floorDiv` ≡ the SQL positive-mod form), so centroids
  *    stay integer vectors — replayable verbatim in DuckDB;
  *  - init is the k smallest ids' vectors (no RNG), assignment ties
  *    break to the lowest centroid index, an emptied cluster keeps
  *    its previous centroid.
  *
  * Scale shape (the part that must survive 100 TB): each Lloyd round
  * is ONE corpus scan — assignment is a closure-captured-centroid
  * primitive loop (a justified UDF: interpreted higher-order
  * functions cost ~50× more per row, and there is no codegen built-in
  * for an argmin over k array distances), then ONE partial-aggregated
  * per-cluster component sum (d `element_at` sums, codegen'd) whose
  * exchange carries ≤ k rows of d+1 longs per partition; driver state
  * is k·d longs per round — the same bounded-driver-walk discipline
  * as the radix-selection quantiles. The quantized projection is
  * persisted across rounds so iterations don't re-read the source.
  * Assignment itself never shuffles row data.
  *
  * Overflow bounds (enforced): distances need (2·max|q|)²·d < 2⁶²;
  * update sums need n·max|q| < 2⁶². Unit-scale embeddings quantize
  * to ~2²⁰, so ~2⁴¹ rows fit — shard the sum beyond that.
  */
object Clustering {

  val Fp: Long = 1L << 20

  /** floor(x·2²⁰) over the float embedding, as exact Long components. */
  def quantize(vecCol: Column): Column =
    transform(vecCol, x => floor(x.cast("double") * lit(Fp.toDouble)).cast("long"))

  /** (cluster, sq_dist) struct for the argmin centroid, ties to the
    * lowest index (strict `<`). A primitive-loop UDF over the k
    * centroids — same justified-UDF precedent as
    * [[Similarity]]'s cell assignment: the `zip_with`/`aggregate`
    * built-ins are interpreted (higher-order functions don't codegen)
    * and cost ~50 µs/row at k=8·d=64 where this loop costs ~1 µs; the
    * arithmetic is the identical integer math either way, so the
    * oracle replay is unaffected. */
  private def assignUdf(cs: Array[Array[Long]]) =
    udf((v: Seq[Long]) => {
      // one primitive copy up front: Seq.apply inside the k×d loop is
      // interface-dispatch-bound and dominates wall time at large k
      // (measured ~100× at k=448); identical integer math either way
      val a = v.toArray
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < cs.length) {
        val c = cs(j)
        var s = 0L
        var i = 0
        while (i < c.length) { val t = a(i) - c(i); s += t * t; i += 1 }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      (best.toLong, bestD)
    })

  private def assignCols(qv: Column, cs: Array[Array[Long]]): (Column, Column) = {
    val a = assignUdf(cs)(qv)
    (a.getField("_1"), a.getField("_2"))
  }

  /** Assignment of any (id, vector) relation under FIXED trained
    * centroids — the "score data with a trained model" form. Stateless
    * narrow map, so it runs unchanged on a STREAMING DataFrame (see
    * [[graft.streaming.StreamingPipeline.clusterAssignStream]]). */
  def assignWithCentroids(df: DataFrame, centroids: Array[Array[Long]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cl, dist) = assignCols(quantize(col(vecCol)), centroids)
    df.select(col(idCol), cl.as("cluster"), dist.as("sq_dist"))
  }

  /** One IVF index relation `(idCol, cluster, __cv)` for a batch
    * under FIXED centroids: the assignment plus the quantized vector
    * the probe scores against — what an IVF index physically stores.
    * Stateless narrow map (per-batch work ∝ batch), so batches
    * append and the index never rebuilds. */
  def ivfIndex(df: DataFrame, centroids: Array[Array[Long]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cl, _) = assignCols(quantize(col(vecCol)), centroids)
    df.select(col(idCol), cl.as("cluster"),
      quantize(col(vecCol)).as("__cv"))
  }

  /** Mean squared quantizer distortion of an [[ivfIndex]] relation
    * under its model — the DRIFT statistic of the fixed-quantizer
    * regime. Per stored vector: exact integer squared L2 to its
    * assigned centroid (one codegen'd `zip_with`/`aggregate` against
    * the broadcast centroid table); averaged in double (a monitor,
    * not an oracle surface — double keeps the mean scale-safe at any
    * corpus size). One narrow pass over the index, no shuffle beyond
    * the broadcast join. */
  def ivfDistortion(idx: DataFrame, centroids: Array[Array[Long]]): Double = {
    val spark = idx.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex
      .map { case (c, cl) => (cl.toLong, c.toSeq) }.toIndexedSeq
      .toDF("cluster", "__cent")
    idx.join(broadcast(cents), Seq("cluster"))
      .select(expr("aggregate(zip_with(__cv, __cent, " +
        "(a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("__d"))
      .agg(avg(col("__d").cast("double"))).head().getDouble(0)
  }

  /** The documented REINDEX TRIGGER for the train-once quantizer
    * ([[ivfIndex]], q139, `annIndexStream`): retrain + reindex when a
    * batch's mean distortion under the fixed model exceeds `maxRatio`
    * × the training batch's own distortion. Rationale: IVF recall
    * degrades when the ingested distribution drifts away from the
    * trained cells — vectors land far from every centroid, cells stop
    * being tight, and a fixed `nProbe` covers a shrinking fraction of
    * true neighbors. Distortion is the standard proxy (the k-means
    * objective itself); in-distribution batches score ≈ the training
    * distortion, so the ratio is a scale-free alarm. The policy is
    * measured, not assumed: `AnnIndexSpec` plants a shifted
    * distribution and shows the trigger fires there while an
    * in-distribution batch stays quiet with margin. */
  def ivfReindexDue(trainDistortion: Double, batchDistortion: Double,
      maxRatio: Double = 2.0): Boolean =
    batchDistortion > maxRatio * trainDistortion

  /** Probe a persisted [[ivfIndex]] relation: for each (query id,
    * quantized query vector), the `nProbe` nearest cells by integer
    * centroid distance (ties → lower cell id), then the exact integer
    * squared-L2 top-`k` among the probed cells' stored vectors
    * (ties → lower id, self excluded). The tiny (query, cell, qv)
    * relation broadcasts against the cluster-keyed index — unprobed
    * cells are never scanned. Integer end-to-end (the q139 oracle
    * replays it bit-for-bit). */
  def ivfProbe(idx: DataFrame, centroids: Array[Array[Long]],
      queries: Seq[(Long, Array[Long])], nProbe: Int, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val spark = idx.sparkSession
    import spark.implicits._
    val probeRows: Seq[(Long, Long, Seq[Long])] = queries.flatMap {
      case (qid, qv) =>
        centroids.zipWithIndex.map { case (c, cl) =>
          var dist = 0L
          var i = 0
          while (i < qv.length) { val t = qv(i) - c(i); dist += t * t; i += 1 }
          (cl.toLong, dist)
        }.sortBy { case (cl, dist) => (dist, cl) }.take(nProbe)
          .map { case (cl, _) => (qid, cl, qv.toSeq) }
    }
    val probeDf = probeRows.toDF("query_id", "cluster", "__qv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__dist"), col(idCol))
    probeDf.join(idx, Seq("cluster"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("__dist", expr(
        "aggregate(zip_with(__qv, __cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"),
        col("__dist").as("sq_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Lloyd training alone: the centroids after `iters` updates —
    * feed [[assignWithCentroids]] to score other data (or a stream)
    * with the trained model. */
  def kmeansCentroids(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 8,
      iters: Int = 3): Array[Array[Long]] = {
    val out = kmeansTrain(df, idCol, vecCol, k, iters)
    out._2.unpersist()
    out._1
  }

  /** Lloyd iterations; returns (id, cluster, sq_dist) under the
    * centroids AFTER `iters` updates. Output is deterministic and
    * partition-invariant (integer arithmetic throughout). The final
    * assignment re-reads the SOURCE (a narrow map) rather than the
    * training cache, so the cache can be released eagerly here instead
    * of leaking for the session lifetime. */
  def kmeansAssign(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 8, iters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(df, idCol, vecCol, k, iters)
    assignWithCentroids(df, centroids, idCol, vecCol)
  }

  /** Shared training loop: (final centroids, persisted quantized
    * projection keyed __id/__qv). */
  private def kmeansTrain(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): (Array[Array[Long]], DataFrame) = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    val qdf = df.select(col(idCol).as("__id"), quantize(col(vecCol)).as("__qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = qdf.agg(
      count(lit(1)),
      max(aggregate(col("__qv"), lit(0L), (m, x) => greatest(m, abs(x))))).head()
    val n = stats.getLong(0)
    val maxAbs = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val d = if (n == 0) 0 else qdf.select(size(col("__qv"))).head().getInt(0)
    require(n >= k, s"k=$k exceeds corpus size $n")
    require(maxAbs < (1L << 30) && 4 * maxAbs * maxAbs * math.max(d, 1) < (1L << 62),
      s"kmeans distance overflow bound exceeded (max|q|=$maxAbs, d=$d)")
    require(maxAbs == 0L || n < (1L << 62) / maxAbs,
      s"kmeans centroid-sum overflow bound exceeded (n=$n, max|q|=$maxAbs) — shard the sum")

    // init: the k smallest ids' quantized vectors, in id order
    var centroids: Array[Array[Long]] = qdf.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)

    for (_ <- 0 until iters) {
      val (cl, _) = assignCols(col("__qv"), centroids)
      // per-cluster component sums as d codegen'd element_at aggregates
      // (NOT a posexplode: a projection above a Generate re-evaluates
      // the assignment expression per exploded row — a d× blowup of
      // the interpreted higher-order distance lambdas. Here the
      // assignment runs once per row as the grouping key and the
      // exchange carries ≤ k·(d+1) partial-agg values per partition.)
      val aggCols = count(lit(1)).as("__n") +:
        (0 until d).map(i => sum(element_at(col("__qv"), i + 1)).as(s"__s$i"))
      val sums = qdf.groupBy(cl.as("__cl"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val next = centroids.map(_.clone())
      val touched = new Array[Boolean](k)
      sums.foreach { r =>
        val c = r.getLong(0).toInt
        val n = r.getLong(1)
        touched(c) = true
        var i = 0
        while (i < d) { next(c)(i) = Math.floorDiv(r.getLong(2 + i), n); i += 1 }
      }
      // an emptied cluster keeps its previous centroid (deterministic)
      centroids = next.indices.map(i => if (touched(i)) next(i) else centroids(i)).toArray
    }
    (centroids, qdf)
  }

  /** SemDeDup: semantic near-dup removal restricted to k-means
    * clusters — a document is dropped iff it has a SAME-CLUSTER
    * cosine neighbor (sim ≥ threshold) with a smaller id (keep-first,
    * the same deterministic policy as exact dedup and q89 span
    * removal). Composes [[kmeansAssign]] with the GROUP-RESTRICTED
    * exact pair search [[Similarity.cosineNearDupPairsWithin]]: the
    * removal rule only consults same-cluster pairs, so the scan
    * enumerates ONLY same-cluster candidates — bit-identical output
    * to filtering the global pair set, at 1/k of its scan (measured
    * at the 100× rehearsal: 463 s → within-cluster; global cell
    * geometry cannot prune cross-cluster pairs at 64-d because the
    * threshold ball rivals the data's ~√2 spread). Per-task state
    * stays chunk-bounded. Survivors carry their cluster id. At
    * 100 TB, scale k with the corpus (SemDeDup's own regime:
    * cluster size ~constant ⇒ total scan ∝ n). */
  def semanticDedupSurvivors(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.45,
      k: Int = 8, iters: Int = 3, nCells: Int = 16): DataFrame = {
    val assign = kmeansAssign(df, idCol, vecCol, k, iters)
      .select(col(idCol), col("cluster"))
    val pairs = Similarity.cosineNearDupPairsWithin(df, assign, threshold,
      nCells, idCol, vecCol)
    // id_b is always the larger id (pairs emit id_a < id_b), and every
    // pair is same-cluster by construction
    val removed = pairs.select(col("id_b").as(idCol)).distinct()
    assign.join(removed, Seq(idCol), "left_anti")
  }
}
