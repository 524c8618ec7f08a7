package graft.datapipe

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for the embedding family — the
  * "shrink 64-d vectors to 8-d before ANN / clustering" preprocessing
  * step of an embedding pipeline.
  *
  * The distributed part — the covariance accumulation — is EXACT and
  * partition-order-independent: each vector's contribution is scaled
  * to fixed point (×2²⁰) and accumulated as LONG sums (integer
  * addition commutes; float sums would make the basis depend on
  * partition order and AQE re-plans). State is one long array of
  * d + d(d+1)/2 + 1 entries per partition, merged associatively — a
  * map-side-combining typed Aggregator, same scale shape as the KMV
  * sketch. Overflow headroom: unit-scale components in fixed point are
  * ~2²⁰, pair products ~2⁴⁰, so ~2²³ rows fit in a signed long — at
  * larger corpora shard the sum with [[shardedMoments]] (per-shard
  * buffers each inside the bound, merged exactly in BigInt on the
  * driver; the q137 query runs this path), asserted in the
  * aggregator either way.
  *
  * The eigensolve runs on the driver over the d×d matrix (d = 64 →
  * trivial): cyclic Jacobi rotations, deterministic given the exact
  * integer covariance, eigenvectors sign-normalized so the basis is
  * reproducible bit-for-bit across runs and partitionings.
  *
  * Projection is built-ins only (`transform` + `aggregate` over the
  * vector column against literal basis rows) — no UDF, no encoder
  * boundary.
  *
  * No DuckDB oracle (an eigensolve is not portably expressible in
  * SQL); pinned by specs instead, like the PQ/IVF-PQ/LSH ANN variants:
  * exact covariance vs brute force, partition invariance of the BASIS,
  * orthonormality, variance ordering, and reconstruction-error
  * monotonicity.
  */
object Embeddings {

  val Fp: Long = 1L << 20

  /** Accumulated exact moments: [n, s_0..s_{d-1}, upper-tri p_ij,
    * max|f|] in fixed point (s ×2²⁰, p ×2⁴⁰). The trailing slot
    * tracks the largest |component| seen (fixed-point), which makes
    * the scaladoc'd overflow bound an enforced invariant: every
    * accumulated pair sum is bounded by n·max|f|², so requiring
    * n·max|f|² < 2⁶² guarantees no Long overflow anywhere in the
    * buffer (with 2× headroom). Larger corpora must shard the sum. */
  final class MomentsAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
    private val len = 2 + d + d * (d + 1) / 2
    private val maxSlot = len - 1
    override def zero: Array[Long] = new Array[Long](len)

    private def checkHeadroom(n: Long, maxAbs: Long): Unit =
      require(
        maxAbs < (1L << 31) &&
          (maxAbs == 0L || n < (1L << 62) / maxAbs / maxAbs),
        s"MomentsAgg overflow bound exceeded (n=$n, max|f|=$maxAbs fixed-point): " +
          "n*max|f|^2 must stay below 2^62 — shard the covariance sum")

    override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
      require(v.length == d, s"expected $d dims, got ${v.length}")
      val f = new Array[Long](d)
      var i = 0
      while (i < d) {
        f(i) = math.round(v(i).toDouble * Fp)
        val a = math.abs(f(i))
        if (a > buf(maxSlot)) buf(maxSlot) = a
        i += 1
      }
      buf(0) += 1L
      checkHeadroom(buf(0), buf(maxSlot))
      i = 0
      var o = 1 + d
      while (i < d) {
        buf(1 + i) += f(i)
        var j = i
        while (j < d) { buf(o) += f(i) * f(j); o += 1; j += 1 }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < maxSlot) { a(i) += b(i); i += 1 }
      a(maxSlot) = math.max(a(maxSlot), b(maxSlot))
      checkHeadroom(a(0), a(maxSlot))
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = Enc.arrayLong
    override def outputEncoder: Encoder[Array[Long]] = Enc.arrayLong
  }

  private object Enc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayLong: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Symmetric per-vector INT8 QUANTIZATION — the embedding STORAGE
    * op at 100 TB (float32 → int8 cuts an embedding store 4×; ANN
    * distance work runs on the codes): each vector is scaled by its
    * own max-|component| and mapped to codes in [-127, 127]. All
    * arithmetic is exact integer fixed point, shared with the q106
    * moment convention (fq = floor(f·2²⁰ + 0.5)):
    *
    *   code_i = (fq_i + amax)·254 DIV (2·amax) − 127
    *
    * (the +amax shift keeps the numerator non-negative, so floor and
    * truncate agree and Spark `DIV` ≡ DuckDB `//`; amax = 0 ⇒ all
    * codes 0). Reconstruction error is emitted in the ×127 scale —
    * |fq_i·127 − code_i·amax| — multiplication only, no division, so
    * the metric is bit-portable; by construction it is ≤ amax
    * (half a quantization step each side).
    *
    * Scale shape: one narrow codegen'd projection per row — no
    * shuffle, no UDF, no state. Emits (id, amax_fp, sum_abs_err127,
    * max_abs_err127, codes_md5) — the md5 gates the full code stream
    * without shipping d INTs per row through the compare. */
  def int8Quantize(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol),
        expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * $Fp + 0.5) AS BIGINT))")
          .as("__fq"))
      .withColumn("amax_fp",
        expr("aggregate(__fq, 0L, (m, x) -> greatest(m, abs(x)))"))
      .withColumn("__codes", expr(
        """transform(__fq, x -> CAST(CASE WHEN amax_fp = 0 THEN 0
          |  ELSE ((x + amax_fp) * 254) DIV (2 * amax_fp) - 127 END AS INT))"""
          .stripMargin))
      .withColumn("__err127", expr(
        "zip_with(__fq, __codes, (f, c) -> abs(f * 127 - CAST(c AS BIGINT) * amax_fp))"))
      .select(col(idCol), col("amax_fp"),
        expr("aggregate(__err127, 0L, (a, x) -> a + x)").as("sum_abs_err127"),
        expr("aggregate(__err127, 0L, (a, x) -> greatest(a, x))").as("max_abs_err127"),
        md5(concat_ws(" ", col("__codes"))).as("codes_md5"))

  /** (mean, covariance) from the exact fixed-point moments. */
  def meanCovariance(emb: DataFrame, vecCol: String, d: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m: Array[Long] = emb.select(col(vecCol)).as[Seq[Float]]
      .select(new MomentsAgg(d).toColumn.name("m"))
      .head()
    val n = m(0).toDouble
    require(n >= 2, "PCA needs at least 2 vectors")
    val mean = Array.tabulate(d)(i => m(1 + i).toDouble / Fp / n)
    val cov = Array.ofDim[Double](d, d)
    var o = 1 + d
    val fp2 = Fp.toDouble * Fp.toDouble
    for (i <- 0 until d; j <- i until d) {
      val e = m(o).toDouble / fp2 / n - mean(i) * mean(j)
      cov(i)(j) = e; cov(j)(i) = e
      o += 1
    }
    (mean, cov)
  }

  /** Top-k eigenvectors of a symmetric matrix by cyclic Jacobi —
    * deterministic, rows are unit eigenvectors ordered by descending
    * eigenvalue, sign-normalized (largest-|component| positive). */
  def topEigenvectors(a0: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    order.take(k).map { e =>
      val vec = Array.tabulate(d)(i => v(i)(e))
      // sign rule: the largest-|x| component is positive
      val m = vec.indices.maxBy(i => math.abs(vec(i)))
      if (vec(m) < 0) vec.map(x => -x) else vec
    }.toArray
  }

  /** One projected component as a SQL term string — `(v[i] - mean_i)
    * * basis_i` summed left-associatively in DOUBLE, with the element
    * reference produced by `idx` (Spark arrays are 0-based, DuckDB
    * lists 1-based). Shared by [[project]] and the q109 DuckDB oracle
    * so both engines parse the SAME shortest-roundtrip double literals
    * and evaluate the SAME association order — IEEE doubles make the
    * results bit-identical. */
  def projectionTermSql(mean: Array[Double], basisRow: Array[Double],
                        idx: Int => String): String =
    basisRow.iterator.zipWithIndex.map { case (b, i) =>
      s"(CAST(${idx(i)} AS DOUBLE) - ${mean(i)}) * $b"
    }.mkString(" + ")

  /** Append `outCol` = the k-dim PCA projection of `vecCol` (centered,
    * `Array[Float]`) via the native [[graft.functions.PcaProjectExpr]]
    * — one codegen'd static call with loops inside, instead of a
    * 512-term literal Add chain whose generated method blows Janino's
    * limit and drops the stage out of codegen. Bit-identical to the
    * literal-chain form ([[projectExprBuilt]], spec-pinned), which is
    * also the exact text the q109 DuckDB oracle replays. */
  def project(emb: DataFrame, vecCol: String, outCol: String,
              mean: Array[Double], basis: Array[Array[Double]]): DataFrame =
    emb.withColumn(outCol,
      graft.functions.Expressions.pca_project(col(vecCol), mean, basis))

  /** The `expr`-built literal-chain twin of [[project]] — the form the
    * q109 oracle mirrors textually. Kept (caller: spec only) so the
    * oracle text provably describes what the native expression
    * computes: the spec pins bit-equality between the two. */
  private[graft] def projectExprBuilt(emb: DataFrame, vecCol: String,
      outCol: String, mean: Array[Double],
      basis: Array[Array[Double]]): DataFrame = {
    val comps = basis.map { row =>
      val terms = projectionTermSql(mean, row, i => s"$vecCol[$i]")
      expr(s"CAST(($terms) AS FLOAT)")
    }
    emb.withColumn(outCol, array(comps: _*))
  }

  /** End-to-end: fit the exact-covariance PCA basis and project. */
  def pcaProject(emb: DataFrame, vecCol: String, d: Int, k: Int,
                 outCol: String = "pca"): DataFrame = {
    val (mean, cov) = meanCovariance(emb, vecCol, d)
    project(emb, vecCol, outCol, mean, topEigenvectors(cov, k))
  }

  /** Fold two `(slot, val)` moment relations (the q106 buffer layout
    * as rows) into the buffer of the UNION corpus: every slot but the
    * last sums (n, component sums, pair-product sums — integer
    * addition commutes), the trailing max-|component| slot takes the
    * max — exactly [[MomentsAgg.merge]], expressed relationally over
    * persisted buffers. This is the steady-state PCA fit: moments are
    * a mergeable sketch (buffer-sized state, 2+d+d(d+1)/2 rows), so
    * each arriving batch folds in with one tiny agg and the corpus is
    * never rescanned; the merged buffer is a pure function of the
    * union corpus regardless of batch boundaries (q138 pins this with
    * the one-shot oracle under the driver hash compare). */
  def momentsMerge(a: DataFrame, b: DataFrame, d: Int): DataFrame = {
    val maxSlot = 1 + d + d * (d + 1) / 2
    a.unionByName(b).groupBy(col("slot"))
      .agg(sum(col("val")).as("__s"), max(col("val")).as("__m"))
      .select(col("slot"),
        when(col("slot") === maxSlot, col("__m")).otherwise(col("__s"))
          .as("val"))
  }

  /** The exact moment buffer of a corpus TOO LARGE for one Long
    * accumulator: rows split into `shards` deterministic hash groups,
    * each shard accumulating its own [[MomentsAgg]] buffer (the
    * per-shard headroom bound n_shard·max|f|² < 2⁶² still enforced —
    * this is the scaladoc'd "shard the sum" escape hatch,
    * implemented), and the S buffers merged on the driver in BigInt,
    * where sums may exceed a Long (the point: a 2²³-row ceiling per
    * buffer becomes shards·2²³ rows overall — pick
    * shards ≥ n/2²² and a 1e9-vector corpus fits). The merged buffer
    * EQUALS the single-aggregator buffer wherever both are in range
    * (integer addition is associative and commutative; spec-pinned on
    * the real table), and feeds the BigInt [[powerIterationFixed]]
    * overload directly. Scale shape: ONE map-side-combined shuffle
    * whose payload is ≤ shards·(2+d+d(d+1)/2) longs — shard count
    * does not change the corpus-scan cost. */
  def shardedMoments(emb: DataFrame, idCol: String, vecCol: String,
      d: Int, shards: Int): Array[BigInt] = {
    require(shards >= 1 && shards <= (1 << 20), s"bad shard count $shards")
    val spark = emb.sparkSession
    import spark.implicits._
    val bufs: Array[Array[Long]] = emb
      .select(pmod(hash(col(idCol)), lit(shards)).as("__shard"),
        col(vecCol).as("__v"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new MomentsAgg(d).toColumn)
      .collect().map(_._2)
    val len = 2 + d + d * (d + 1) / 2
    val out = Array.fill(len)(BigInt(0))
    bufs.foreach { b =>
      var i = 0
      while (i < len - 1) { out(i) += BigInt(b(i)); i += 1 }
      if (BigInt(b(len - 1)) > out(len - 1)) out(len - 1) = BigInt(b(len - 1))
    }
    out
  }

  /** Dominant eigenvector of the EXACT integer scaled covariance
    * `A = n·P − s·sᵀ` (= n²·Cov in ×2⁴⁰ fixed point, PSD by
    * construction) by `iters` power-iteration steps in pure integer
    * arithmetic: `w = A·v`, then `v ← (w·2²⁰) / max|w|` with
    * truncating division (BigInt `/` truncates toward zero, which is
    * exactly DuckDB 1.0 `//` — verified: `-7 // 2 = -3` there), the
    * iterate re-normalized to max-component scale 2²⁰ each step.
    * Every operation is exact big-integer add/multiply/divide, so the
    * whole solve — unlike the float Jacobi basis ([[topEigenvectors]])
    * — is REPLAYABLE BY AN INDEPENDENT SQL ENGINE: the q137 oracle
    * runs the identical iteration in DuckDB HUGEINT from the raw
    * floats and must reproduce every component bit-for-bit. This
    * closes the oracle seam around the one PCA stage that was
    * spec-pinned only (the driver eigensolve): the float Jacobi basis
    * is cross-checked against this integer witness by
    * `PowerIterSpec` (cosine ≈ 1 with Jacobi's first eigenvector).
    *
    * Returns (v, lam): `v` the final iterate (d components, scale
    * 2²⁰, |v_i| ≤ 2²⁰), `lam` the floor'd Rayleigh quotient
    * `⌊vᵀAv / (vᵀv·n²)⌋` — the dominant eigenvalue of the covariance
    * in ×2⁴⁰ fixed point (non-negative: A is PSD, so the integer
    * quadratic form is ≥ 0 for ANY integer v).
    *
    * Overflow posture: all driver arithmetic is BigInt (unbounded);
    * the enforced headroom bound below guarantees the ORACLE's
    * 128-bit HUGEINT never overflows either (d²·maxA·2⁴⁰ < 2¹²⁶
    * bounds every partial sum in the mat-vec and the Rayleigh
    * numerator), so both engines fail loudly, never silently. */
  def powerIterationFixed(m: Array[Long], d: Int,
      iters: Int): (Array[BigInt], BigInt) = {
    // A Long-stored buffer is only trustworthy inside the single-
    // aggregator headroom bound (n·max|f|² < 2⁶²). A buffer built by
    // RELATIONAL merges (q138, momentsStream) never passed through
    // one aggregator's check, and repeated folds can exceed the bound
    // while every individual batch was inside it — re-assert at read
    // time so a wrapped Long can never be solved silently.
    if (m.nonEmpty) {
      val mx = BigInt(m.last)
      require(mx == 0 || BigInt(m(0)) * mx * mx < (BigInt(1) << 62),
        s"Long moment buffer outside the n*max|f|^2 < 2^62 headroom " +
          s"(n=${m(0)}, max|f|=${m.last}): sums may have wrapped — " +
          "accumulate with shardedMoments and solve the BigInt buffer")
    }
    powerIterationFixed(m.map(BigInt(_)), d, iters)
  }

  /** BigInt-buffer overload — the entry point for SHARDED moment
    * buffers ([[shardedMoments]]), whose merged sums may exceed a
    * Long even though every per-shard buffer fits one. */
  def powerIterationFixed(m: Array[BigInt], d: Int,
      iters: Int): (Array[BigInt], BigInt) = {
    val a = covMatrix(m, d, iters)
    val v = iterate(a, d, iters)
    (v, rayleighOf(a, v, d, m(0)))
  }

  /** Exact scaled covariance `A = n·P − s·sᵀ` from a moment buffer,
    * with the HUGEINT-replay headroom asserted — the shared front of
    * both integer solves. */
  private def covMatrix(m: Array[BigInt], d: Int,
      iters: Int): Array[Array[BigInt]] = {
    require(iters >= 1 && m.length == 2 + d + d * (d + 1) / 2,
      s"bad moment buffer for d=$d")
    val n = m(0)
    require(n >= 2, "power iteration needs at least 2 vectors")
    val s = Array.tabulate(d)(i => m(1 + i))
    val a = Array.ofDim[BigInt](d, d)
    var o = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = n * m(o) - s(i) * s(j)
        a(i)(j) = v; a(j)(i) = v
        o += 1; j += 1
      }
      i += 1
    }
    val maxA = a.iterator.flatten.map(_.abs).max
    require(maxA * BigInt(d) * BigInt(d) * Fp * Fp < (BigInt(1) << 126),
      s"powerIterationFixed HUGEINT headroom exceeded (max|A|=$maxA): " +
        "the DuckDB replay would overflow 128-bit — shard or rescale")
    a
  }

  private def matVec(a: Array[Array[BigInt]], x: Array[BigInt],
      d: Int): Array[BigInt] =
    Array.tabulate(d)(i => (0 until d).iterator.map(j => a(i)(j) * x(j))
      .foldLeft(BigInt(0))(_ + _))

  /** `iters` steps of `w = A·v; v ← (w·2²⁰) / max|w|` from the
    * all-2²⁰ start, truncating division — the exact loop both DuckDB
    * replays unroll. */
  private def iterate(a: Array[Array[BigInt]], d: Int,
      iters: Int): Array[BigInt] = {
    val fp = BigInt(Fp)
    var v = Array.fill(d)(fp)
    for (_ <- 1 to iters) {
      val w = matVec(a, v, d)
      val mx = w.iterator.map(_.abs).max
      v = if (mx.signum == 0) Array.fill(d)(BigInt(0))
          else w.map(x => (x * fp) / mx)
    }
    v
  }

  /** Floor'd Rayleigh quotient `⌊vᵀAv / (vᵀv·n²)⌋` — the eigenvalue
    * estimate in covariance ×2⁴⁰ fixed point. */
  private def rayleighOf(a: Array[Array[BigInt]], v: Array[BigInt],
      d: Int, n: BigInt): BigInt = {
    val wf = matVec(a, v, d)
    val vtv = (0 until d).iterator.map(i => v(i) * v(i)).foldLeft(BigInt(0))(_ + _)
    val num = (0 until d).iterator.map(i => v(i) * wf(i)).foldLeft(BigInt(0))(_ + _)
    if (vtv.signum == 0) BigInt(0) else num / (vtv * n * n)
  }

  /** SECOND principal component by exact-integer Hotelling deflation
    * (q141) — the step that extends the q137 oracle seam closure past
    * the dominant eigenvector. From the same moment buffer:
    *
    *  1. solve v₁ by [[powerIterationFixed]]'s iteration (identical
    *     64 truncating steps);
    *  2. deflate with INTEGER arithmetic only: with `den = v₁ᵀv₁` and
    *     the truncated A-scale eigenvalue `λ̂ = ⌊v₁ᵀAv₁ / den⌋`,
    *     form `A′ = A·den − λ̂·v₁v₁ᵀ` — exactly `den` times the
    *     Hotelling deflation `A − λ·v₁v₁ᵀ/den` (a positive scalar
    *     multiple, so the eigenvectors are unchanged; the ≤1-ulp
    *     truncation of λ̂ perturbs the annihilated direction by
    *     < 2⁻⁴⁰ relative — far below the 2⁻²⁰ iterate resolution);
    *  3. renormalize the matrix itself to max-entry scale ~2²¹ with
    *     one truncating division `A″ = A′ // max(1, ⌊max|A′|/2²⁰⌋)`
    *     (again a ~scalar multiple; keeps the second solve's matvec
    *     partial sums ≤ d·2⁴² — trivially inside HUGEINT, so the
    *     oracle replay cannot overflow no matter how large A was);
    *  4. run the identical 64-step iteration on A″; report the
    *     Rayleigh eigenvalue of the iterate against the ORIGINAL A
    *     (covariance ×2⁴⁰ scale, same as q137's slot d).
    *
    * Every step is add/multiply/truncating-divide on integers, so the
    * whole deflation is REPLAYED BIT-FOR-BIT by the q141 DuckDB
    * oracle (HUGEINT CTEs). Headroom: the covMatrix bound
    * maxA·d²·2⁴⁰ < 2¹²⁶ already caps both A′ terms (|A·den| ≤
    * maxA·d·2⁴⁰ and |λ̂·v_i·v_j| ≤ d²·maxA·2⁴⁰), and max|A′| < 2¹²⁷
    * is re-asserted explicitly below. Degenerate inputs (zero
    * covariance ⇒ v₁ = 0 ⇒ den = 0) flow through as the zero matrix
    * and a zero result in both engines. */
  def deflatedPowerIterationFixed(m: Array[BigInt], d: Int,
      iters: Int): (Array[BigInt], BigInt) = {
    val basis = deflatedBasisFixed(m, d, iters, 2)
    basis(1)
  }

  /** Top-`k` integer eigenbasis by ITERATED Hotelling deflation — the
    * generalization of the q137/q141 chain: solve, deflate with the
    * exact-integer rule `A′ = A·(vᵀv) − ⌊vᵀAv/vᵀv⌋·vvᵀ`, renormalize
    * the matrix with one truncating division to max-entry ~2²¹, and
    * repeat. Each returned (vector ×2²⁰, Rayleigh eigenvalue ×2⁴⁰)
    * reports the eigenvalue against the ORIGINAL covariance, so the
    * sequence is the λ₁ ≥ λ₂ ≥ … spectrum head. Every step is
    * add/multiply/truncating-divide — the whole chain is replayable
    * by the q137/q141 oracle pattern (q137 pins step 1, q141 pins a
    * full deflation round in the second engine; further components
    * repeat the identical arithmetic, tied to the float Jacobi basis
    * by `PowerIterSpec`). The renormalization between rounds caps
    * every matrix at max-entry ~2²¹ after the first deflation, so
    * chain depth cannot grow the operand width: the k=2 headroom
    * argument covers any k. */
  def deflatedBasisFixed(m: Array[BigInt], d: Int, iters: Int,
      k: Int): Array[(Array[BigInt], BigInt)] = {
    require(k >= 1 && k <= d, s"bad component count $k for d=$d")
    val a = covMatrix(m, d, iters)
    val n = m(0)
    val out = Array.newBuilder[(Array[BigInt], BigInt)]
    var cur = a
    for (_ <- 1 to k) {
      val v = iterate(cur, d, iters)
      out += ((v, rayleighOf(a, v, d, n)))
      val den = (0 until d).iterator.map(i => v(i) * v(i))
        .foldLeft(BigInt(0))(_ + _)
      val w = matVec(cur, v, d)
      val num = (0 until d).iterator.map(i => v(i) * w(i))
        .foldLeft(BigInt(0))(_ + _)
      val lamHat = if (den.signum == 0) BigInt(0) else num / den
      val defl = Array.tabulate(d, d)((i, j) =>
        cur(i)(j) * den - lamHat * v(i) * v(j))
      val maxD = defl.iterator.flatten.map(_.abs).max
      require(maxD < (BigInt(1) << 127),
        s"deflated matrix outside HUGEINT (max|A'|=$maxD) — shard or rescale")
      val sc = (maxD / BigInt(Fp)).max(BigInt(1))
      cur = defl.map(_.map(_ / sc))
    }
    out.result()
  }
}
