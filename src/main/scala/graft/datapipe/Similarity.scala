package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (builder brief):
  * brute-force cosine top-k baseline and an IVF (inverted-file) variant
  * as the scale path.
  *
  * Scale design:
  *  - brute force is a broadcast nested-loop of Q queries × N corpus —
  *    correct baseline, O(Q·N·d); the corpus side streams (never
  *    collected), queries broadcast, so it scales to any N with small Q;
  *  - IVF: coarse k-means centroids trained on the FULL corpus by the
  *    deterministic fixed-point distributed Lloyd trainer
  *    ([[Clustering.kmeansCentroids]] — integer arithmetic, so the
  *    centroid table is bit-identical on any partitioning), corpus
  *    partitioned once by nearest centroid; a query probes only
  *    `nProbe` nearest cells — the classic Faiss IVF layout expressed
  *    relationally (cell id = join key, so Catalyst turns the probe
  *    into a hash join on cell id).
  */
object Similarity {

  @inline private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  @inline private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** ArrayData-level cosine for the native [[graft.functions.CosineSimExpr]]:
    * reads floats straight out of the columnar array (no Seq boxing) with
    * the identical accumulation order and zero-norm convention as
    * [[cosine]] — results are bit-equal. */
  def cosineArrayData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val sa = math.sqrt(na)
    val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else d / (sa * sb)
  }

  /** Codegen'd cosine column (no ScalaUDF encoder boundary). */
  private def cosineCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.Expressions.cosine_sim(a, b)

  /** Brute-force cosine top-k: for each query vector (rows of `queries`),
    * the k nearest corpus rows. Output: (query_id, rank, neighbor_id).
    *
    * Top-k via [[graft.functions.TopK]] — a map-side-combining
    * Aggregator, NOT a window: the exchange carries ≤ k rows per query
    * per input partition instead of all N·Q scored candidates.
    */
  def knnBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineCol(col("qvec"), col("cvec")))
    topKRanked(scored, k)
  }

  /** groupBy + top-k aggregator + posexplode → (query_id, rank, neighbor_id). */
  private[datapipe] def topKRanked(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(k)(col("sim"), col("neighbor_id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("s.id").as("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))

  /** Unit-normalized vector column (zero vectors pass through) — the
    * FAISS cosine-metric convention: normalize, then train/score with
    * L2 machinery. */
  private val unitUdf = udf((v: Seq[Float]) => unit(v.toArray).toSeq)

  /** Deterministic coarse-quantizer training on the FULL corpus:
    * unit-normalize, run the fixed-point distributed Lloyd trainer
    * ([[Clustering.kmeansCentroids]] — integer distances/centroids, one
    * scan + one bounded partial agg per round), then de-quantize to
    * floats. Replaces the historical 4096-row sampled collect: every
    * corpus vector now weighs on the centroids, and the table is
    * bit-identical on any partitioning (spec-pinned). Downstream cell
    * assignment by cosine argmax is scale-invariant in the centroid, so
    * de-quantization only rescales. Requires corpus rows ≥ nCells.
    * cellId = index. */
  def trainCentroids(corpus: DataFrame, nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      lloydIters: Int = 2): Array[Array[Float]] = {
    val unitized = corpus.select(col(idCol).as("__id"),
      unitUdf(col(vecCol)).as("__uv"))
    Clustering.kmeansCentroids(unitized, "__id", "__uv",
        k = nCells, iters = lloydIters)
      .map(_.map(q => (q.toDouble / Clustering.Fp).toFloat))
  }

  private def nearestCell(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestSim = Double.MinValue
    var i = 0
    while (i < centroids.length) {
      val s = cosine(centroids(i), v)
      if (s > bestSim) { bestSim = s; best = i }
      i += 1
    }
    best
  }

  private def nearestCells(centroids: Array[Array[Float]], v: Array[Float], n: Int): Array[Int] =
    centroids.indices.map(i => (cosine(centroids(i), v), i))
      .sortBy(t => (-t._1, t._2)).take(n).map(_._2).toArray

  /** IVF top-k: partition corpus by nearest centroid; queries probe the
    * nProbe nearest cells only. Recall < 1.0 by design; centroids and
    * assignments are broadcast/derived deterministically.
    */
  def knnIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = trainCentroids(corpus, nCells, idCol, vecCol)
    val bc = spark.sparkContext.broadcast(centroids)
    val cellUdf = udf((v: Seq[Float]) => nearestCell(bc.value, v.toArray))
    val probeUdf = udf((v: Seq[Float]) => nearestCells(bc.value, v.toArray, nProbe))

    val indexed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cell", cellUdf(col("cvec")))
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(probeUdf(col("qvec"))))
    val scored = indexed.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineCol(col("qvec"), col("cvec")))
    // no dedup needed: each corpus vector lives in exactly one cell, so
    // a (query, neighbor) pair can only arise from one probed cell
    topKRanked(scored, k)
  }

  /** Deterministic random hyperplanes for LSH: component (i, j) is a
    * uniform value in [-1, 1) derived from mix64 — same corpus ⇒ same
    * buckets, no RNG state. */
  private[datapipe] def hyperplanes(nBits: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(nBits) { i =>
      Array.tabulate(dim) { j =>
        val h = Hashing.mix64(0x9e3779b97f4a7c15L * (i.toLong * dim + j + 1))
        ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
    }

  /** Signature bucket + per-bit margins (|dot| — small margin = the bit
    * most likely to differ for near neighbors). */
  private def lshSig(planes: Array[Array[Float]], v: Array[Float]): (Int, Array[Double]) = {
    var sig = 0
    val margins = new Array[Double](planes.length)
    var i = 0
    while (i < planes.length) {
      var d = 0.0
      val p = planes(i)
      var j = 0
      while (j < p.length) { d += p(j).toDouble * v(j).toDouble; j += 1 }
      if (d >= 0) sig |= (1 << i)
      margins(i) = math.abs(d)
      i += 1
    }
    (sig, margins)
  }

  /** Multi-probe bucket sequence: own bucket, then single- and
    * double-bit flips ordered by the summed margin of the flipped bits
    * (a low-|dot| bit is the one a true neighbor most likely disagrees
    * on), truncated to nProbe — the classic multi-probe LSH schedule
    * (Lv et al., VLDB'07). */
  private def probeSeq(sig: Int, margins: Array[Double], nProbe: Int): Array[Int] = {
    val n = margins.length
    val cands = scala.collection.mutable.ArrayBuffer((0.0, sig))
    var i = 0
    while (i < n) {
      cands += ((margins(i), sig ^ (1 << i)))
      var j = i + 1
      while (j < n) {
        cands += ((margins(i) + margins(j), sig ^ (1 << i) ^ (1 << j)))
        j += 1
      }
      i += 1
    }
    cands.sortBy(_._1).map(_._2).distinct.take(nProbe).toArray
  }

  /** LSH-bucketed ANN (the brief's "LSH-bucketed variant"): random-
    * hyperplane signatures bucket the corpus (one 32-bit key per
    * vector — the scale path: the index is an int column, the shuffle
    * key 4 bytes); queries multi-probe their nearest buckets and re-rank
    * exactly inside them. Recall < 1 by design — the recall spec pins
    * the floor; [[cosineNearDupPairs]] is the exact-complete
    * alternative. */
  def knnLsh(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nBits: Int = 12,
      nProbe: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nBits, dim)
    val bc = spark.sparkContext.broadcast(planes)
    val bucketUdf = udf((v: Seq[Float]) => lshSig(bc.value, v.toArray)._1)
    val probesUdf = udf((v: Seq[Float]) => {
      val (sig, margins) = lshSig(bc.value, v.toArray)
      probeSeq(sig, margins, nProbe)
    })
    val indexed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("bucket", bucketUdf(col("cvec")))
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("bucket", explode(probesUdf(col("qvec"))))
    val scored = indexed.join(broadcast(probed), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineCol(col("qvec"), col("cvec")))
    // each corpus vector lives in exactly one bucket and probe buckets
    // are distinct, so no (query, neighbor) dedup is needed
    topKRanked(scored, k)
  }

  @inline private def unit(v: Array[Float]): Array[Float] = {
    val n = norm(v)
    if (n == 0.0) v
    else {
      val out = new Array[Float](v.length)
      var i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  @inline private def euclid(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Embedding-cosine near-duplicate pairs: EVERY corpus pair with
    * cosine ≥ threshold — exact, via metric cell blocking with a
    * triangle-inequality completeness guarantee (unlike multi-probe
    * heuristics, which were measured to miss boundary pairs).
    *
    * On unit vectors cos(u,v) ≥ t ⟺ ‖u−v‖ ≤ r = √(2(1−t)). Each vector
    * is assigned to its single nearest unit centroid; per-cell radii
    * R_c = max member distance are collected (nCells doubles — driver
    * scale-safe). A qualifying pair in cells (i,j) forces
    * d(c_i,c_j) ≤ R_i + R_j + r (triangle inequality), so only those
    * cell pairs are joined. At near-dup thresholds (t → 1, r → 0) this
    * prunes toward adjacent cells only — near-linear candidates; as
    * t → 0 it degrades gracefully to the full (still correct) join.
    * Requires threshold > 0 (zero-norm vectors have cos = 0 by
    * convention and are excluded from blocking).
    *
    * PER-TASK BOUND: cell member lists are NOT materialized whole — a
    * hot cell at corpus scale would otherwise become one multi-GB row.
    * Each cell is split into hash chunks of ~`maxCell` expected members
    * (nChunks = ⌈n/maxCell⌉ from the same one-pass stats aggregate as
    * the radii), and EVERY chunk pair inside an admissible cell pair is
    * scanned. Chunking is a pure partition of the double loop: each
    * unordered vector pair occurs in exactly one (cell, chunk) pair, so
    * exactness needs no new admissibility argument, and a task holds at
    * most two ~maxCell-member chunks regardless of cell skew (hash
    * balance concentrates chunk sizes tightly for maxCell ≫ 1). */
  def cosineNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      nCells: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCell: Int = 4096): DataFrame =
    cosineNearDupPairsImpl(corpus, None, threshold, nCells, idCol, vecCol,
      maxCell)

  /** [[cosineNearDupPairs]] restricted to pairs INSIDE one group of a
    * disjoint partition (`groups`: idCol → groupCol, e.g. a k-means
    * cluster assignment): only same-group pairs are scanned OR
    * emitted. This is the SemDeDup scan shape — its removal rule only
    * ever consults same-cluster pairs, so enumerating the global pair
    * set first (and filtering after) pays a ×(number of groups)
    * overscan that high-dimensional cell geometry cannot prune away
    * (at 64-d the threshold ball radius r = √(2(1−t)) rivals the
    * ~√2 spread of near-orthogonal data, so cross-group candidate
    * pairs survive admissibility and each costs a full dot product —
    * measured at the 100× rehearsal: restricting the scan took q96
    * from 463 s to the per-group quadratic). Exactness argument is
    * unchanged — the group key simply rides the cell/chunk key, and a
    * same-group pair lands in exactly one (group, cell-pair, chunk-
    * pair); per-(group, cell) radii only ever shrink admissibility
    * relative to global radii. */
  def cosineNearDupPairsWithin(
      corpus: DataFrame,
      groups: DataFrame,
      threshold: Double,
      nCells: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      groupCol: String = "cluster",
      maxCell: Int = 4096): DataFrame =
    cosineNearDupPairsImpl(corpus, Some((groups, groupCol)), threshold,
      nCells, idCol, vecCol, maxCell)

  private def cosineNearDupPairsImpl(
      corpus: DataFrame,
      groupsOpt: Option[(DataFrame, String)],
      threshold: Double,
      nCells: Int,
      idCol: String,
      vecCol: String,
      maxCell: Int): DataFrame = {
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    require(maxCell > 0, s"maxCell must be > 0, got $maxCell")
    val spark = corpus.sparkSession
    val centroids = trainCentroids(corpus, nCells, idCol, vecCol).map(unit)
    val bc = spark.sparkContext.broadcast(centroids)
    val r = math.sqrt(math.max(0.0, 2.0 * (1.0 - threshold)))
    // (cell, distance-to-centroid) of the normalized vector
    val assignUdf = udf((v: Seq[Float]) => {
      val u = unit(v.toArray)
      val cs = bc.value
      var best = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val d = euclid(cs(i), u)
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      (best, bestD)
    })
    val base = corpus
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(normUdf(col("vec")) > 0.0)
    val grouped = groupsOpt match {
      case Some((g, gc)) => base.join(
        g.select(col(idCol).as("id"), col(gc).cast("long").as("grp")), "id")
      case None => base.withColumn("grp", lit(0L))
    }
    val assigned = grouped
      .withColumn("ad", assignUdf(col("vec")))
      .select(col("id"), col("vec"), col("grp"),
        col("ad._1").as("cell"), col("ad._2").as("cdist"))
    // cache only for the stats collection; the main job recomputes the
    // (deterministic, cheap) assignment rather than pinning the corpus
    // in executor storage for the session lifetime
    assigned.cache()
    // one pass for radii AND member counts, per (group, cell):
    // O(groups × nCells) rows to the driver
    val radii = scala.collection.mutable.Map.empty[(Long, Int), Double]
    val nChunks = scala.collection.mutable.Map.empty[(Long, Int), Long]
    assigned.groupBy(col("grp"), col("cell"))
      .agg(max(col("cdist")).as("radius"), count(lit(1)).as("n"))
      .collect().foreach { row =>
        val key = (row.getLong(0), row.getInt(1))
        radii(key) = row.getDouble(2)
        nChunks(key) = (row.getLong(3) + maxCell - 1) / maxCell
      }
    assigned.unpersist()
    val grps = radii.keySet.map(_._1).toSeq.sorted
    // admissible unordered cell pairs i <= j per group (triangle
    // inequality over that group's own radii — never wider than the
    // global radii); each vector lives in exactly one (group, cell),
    // so a same-group pair appears in at most one pair — no distinct
    val cellPairs = for {
      g <- grps
      i <- centroids.indices
      if radii.contains((g, i))
      j <- i until centroids.length
      if radii.contains((g, j))
      if euclid(centroids(i), centroids(j)) <=
        radii((g, i)) + radii((g, j)) + r
    } yield (g, i, j)
    import spark.implicits._
    // expand admissible cell pairs to chunk pairs; within one cell only
    // the unordered chunk pairs ca <= cb (the scan handles ca == cb with
    // its same-group triangular loop)
    val chunkPairs = cellPairs.flatMap { case (g, i, j) =>
      for {
        ca <- 0L until nChunks((g, i))
        cb <- 0L until nChunks((g, j))
        if i != j || ca <= cb
      } yield (g, i, ca, j, cb)
    }.toDF("grp", "cell_a", "chunk_a", "cell_b", "chunk_b")
    // join at CHUNK-pair granularity, not member-pair granularity: the
    // quadratic scan runs inside the UDF over primitive arrays, so no
    // per-candidate-pair rows cross an operator boundary
    val nChunksMap = nChunks.toMap
    val nChunksOf = udf((grp: Long, cell: Int) => nChunksMap((grp, cell)))
    val chunkMembers = assigned
      .withColumn("chunk",
        pmod(xxhash64(col("id")), nChunksOf(col("grp"), col("cell"))))
      .groupBy(col("grp"), col("cell"), col("chunk"))
      .agg(collect_list(struct(col("id"), col("vec"))).as("ms"))
    val a = chunkMembers.select(col("grp"), col("cell").as("cell_a"),
      col("chunk").as("chunk_a"), col("ms").as("ms_a"))
    val b = chunkMembers.select(col("grp"), col("cell").as("cell_b"),
      col("chunk").as("chunk_b"), col("ms").as("ms_b"))
    val scanUdf = udf((msA: Seq[org.apache.spark.sql.Row], msB: Seq[org.apache.spark.sql.Row], same: Boolean) => {
      def unpack(ms: Seq[org.apache.spark.sql.Row]): (Array[Long], Array[Array[Float]]) = {
        val ids = new Array[Long](ms.length)
        val vecs = new Array[Array[Float]](ms.length)
        var i = 0
        ms.foreach { row =>
          ids(i) = row.getLong(0)
          vecs(i) = row.getSeq[Float](1).toArray
          i += 1
        }
        (ids, vecs)
      }
      val (idsA, vecsA) = unpack(msA)
      val (idsB, vecsB) = if (same) (idsA, vecsA) else unpack(msB)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < idsA.length) {
        var j = if (same) i + 1 else 0
        while (j < idsB.length) {
          val s = cosine(vecsA(i), vecsB(j))
          if (s >= threshold && idsA(i) != idsB(j)) {
            val (x, y) = if (idsA(i) < idsB(j)) (idsA(i), idsB(j)) else (idsB(j), idsA(i))
            out += ((x, y, s))
          }
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    a.join(broadcast(chunkPairs), Seq("grp", "cell_a", "chunk_a"))
      .join(b, Seq("grp", "cell_b", "chunk_b"))
      .select(explode(scanUdf(col("ms_a"), col("ms_b"),
        col("cell_a") === col("cell_b") && col("chunk_a") === col("chunk_b"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        round(col("p._3"), 4).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------
  // Product quantization (PQ): the memory-scale path for ANN. A d-dim
  // float vector (d·4 bytes) compresses to m bytes — one codebook id
  // per subspace — so a 100 TB embedding corpus scans as ~0.8 TB of
  // codes. Queries score codes with an asymmetric-distance table (m×ks
  // partial dot products, computed once per query) and optionally
  // re-rank the top candidates exactly.
  // ---------------------------------------------------------------

  /** Per-subspace codebooks over UNIT vectors: [m][ks][d/m] floats.
    * Each subspace trains on the FULL corpus with the fixed-point
    * distributed Lloyd trainer (slice the persisted unit projection,
    * run [[Clustering.kmeansCentroids]]) — deterministic and
    * partition-invariant, same recipe as [[trainCentroids]]. Requires
    * corpus rows ≥ ks. */
  def trainPq(corpus: DataFrame, m: Int, ks: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      lloydIters: Int = 3): Array[Array[Array[Float]]] = {
    val unitized = corpus.select(col(idCol).as("__id"),
        unitUdf(col(vecCol)).as("__uv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = unitized.select(size(col("__uv"))).head().getInt(0)
      require(d % m == 0, s"dim $d not divisible by m=$m")
      val dsub = d / m
      Array.tabulate(m) { j =>
        val sub = unitized.select(col("__id"),
          slice(col("__uv"), j * dsub + 1, dsub).as("__sv"))
        Clustering.kmeansCentroids(sub, "__id", "__sv",
            k = ks, iters = lloydIters)
          .map(_.map(q => (q.toDouble / Clustering.Fp).toFloat))
      }
    } finally { unitized.unpersist(); () }
  }

  /** Encode each corpus vector as m codebook ids (id, code:binary). */
  def pqEncode(corpus: DataFrame, codebooks: Array[Array[Array[Float]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val encodeUdf = udf((v: Seq[Float]) => {
      val cbs = bc.value
      val u = unit(v.toArray)
      val m = cbs.length
      val dsub = u.length / m
      val code = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val sub = java.util.Arrays.copyOfRange(u, j * dsub, (j + 1) * dsub)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cbs(j).length) {
          val dd = euclid(cbs(j)(c), sub)
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        code(j) = best.toByte
        j += 1
      }
      code
    })
    corpus.select(col(idCol).as("neighbor_id"), encodeUdf(col(vecCol)).as("code"))
  }

  /** PQ top-k with asymmetric-distance scoring and exact re-ranking:
    * score all codes via m table lookups per candidate (the corpus
    * side never materializes floats), keep `k·refine` per query with
    * the map-side TopK aggregator, then re-rank those few exactly
    * against the original vectors. */
  def knnPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      ks: Int = 16,
      refine: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val codebooks = trainPq(corpus, m, ks, idCol, vecCol)
    val codes = pqEncode(corpus, codebooks, idCol, vecCol)
    // per-query ADC table: adc[j][c] = dot(q_j, codebook[j][c]); the
    // approximate inner product of unit vectors ≈ cosine
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val adcUdf = udf((q: Seq[Float]) => {
      val cbs = bcCb.value
      val u = unit(q.toArray)
      val dsub = u.length / cbs.length
      cbs.indices.flatMap { j =>
        cbs(j).map { c =>
          var s = 0.0
          var i = 0
          while (i < dsub) { s += c(i) * u(j * dsub + i); i += 1 }
          s
        }
      }.toArray
    })
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("adc", adcUdf(col("qvec")))
    val scoreUdf = udf((adc: Seq[Double], code: Array[Byte]) => {
      var s = 0.0
      var j = 0
      while (j < code.length) {
        s += adc(j * ks + (code(j) & 0xff))
        j += 1
      }
      s
    })
    val approx = codes.join(broadcast(q.select(col("query_id"), col("adc"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", scoreUdf(col("adc"), col("code")))
    val shortlist = topKRanked(approx, k * refine)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank of the shortlist
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val rescored = shortlist
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qvec"))), Seq("query_id"))
      .withColumn("sim", cosineCol(col("qvec"), col("cvec")))
    topKRanked(rescored, k)
  }

  /** IVF-PQ: the composed at-scale ANN layout (inverted file over
    * coarse cells × product-quantized codes inside). The corpus stores
    * (cell, m-byte code) per vector; a query probes its nProbe nearest
    * cells and ADC-scores only those cells' codes; the k·refine
    * shortlist re-ranks exactly. Memory: m bytes + one int per vector;
    * compute per query: |probed cells|/nCells of the corpus, m lookups
    * each. */
  def knnIvfPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      ks: Int = 16,
      refine: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = trainCentroids(corpus, nCells, idCol, vecCol)
    val codebooks = trainPq(corpus, m, ks, idCol, vecCol)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val cellUdf = udf((v: Seq[Float]) => nearestCell(bcCent.value, v.toArray))
    val probeUdf = udf((v: Seq[Float]) => nearestCells(bcCent.value, v.toArray, nProbe))
    val encodeUdf = udf((v: Seq[Float]) => {
      val cbs = bcCb.value
      val u = unit(v.toArray)
      val dsub = u.length / cbs.length
      val code = new Array[Byte](cbs.length)
      var j = 0
      while (j < cbs.length) {
        val sub = java.util.Arrays.copyOfRange(u, j * dsub, (j + 1) * dsub)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cbs(j).length) {
          val dd = euclid(cbs(j)(c), sub)
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        code(j) = best.toByte
        j += 1
      }
      code
    })
    val adcUdf = udf((q: Seq[Float]) => {
      val cbs = bcCb.value
      val u = unit(q.toArray)
      val dsub = u.length / cbs.length
      cbs.indices.flatMap { j =>
        cbs(j).map { c =>
          var s = 0.0
          var i = 0
          while (i < dsub) { s += c(i) * u(j * dsub + i); i += 1 }
          s
        }
      }.toArray
    })
    val scoreUdf = udf((adc: Seq[Double], code: Array[Byte]) => {
      var s = 0.0
      var j = 0
      while (j < code.length) {
        s += adc(j * ks + (code(j) & 0xff))
        j += 1
      }
      s
    })
    val indexed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cell", cellUdf(col("cvec")))
      .withColumn("code", encodeUdf(col("cvec")))
      .drop("cvec")
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("adc", adcUdf(col("qvec")))
      .withColumn("cell", explode(probeUdf(col("qvec"))))
    val approx = indexed
      .join(broadcast(probed.select(col("cell"), col("query_id"), col("adc"))), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", scoreUdf(col("adc"), col("code")))
    val shortlist = topKRanked(approx, k * refine)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val rescored = shortlist
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", cosineCol(col("qvec"), col("cvec")))
    topKRanked(rescored, k)
  }

  private val normUdf = udf((v: Seq[Float]) => {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  })
}
