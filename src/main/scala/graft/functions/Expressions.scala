package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (brief: "a native Catalyst Expression
  * (with doGenCode) beats a Scala UDF"). Unlike a ScalaUDF these stay
  * inside whole-stage codegen: no encoder boundary, no closure
  * serialization, null handling folded into the generated branchwork.
  */

/** Token count via the bio tokenizer, codegen'd as a static call. */
case class BioTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bio_token_count"

  override protected def nullSafeEval(input: Any): Any =
    graft.text.BioTokenizer.tokenCount(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.text.BioTokenizer.tokenCount($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BioTokenCountExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a text column, codegen'd. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.datapipe.Hashing.simhash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.datapipe.Hashing.simhash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over md5-derived token hashes (engine-portable: the
  * token hash is DuckDB's md5_number_lower, so the DuckDB oracle can
  * recompute the same simhash — Hashing.simhashMd5). The FNV-based
  * [[SimHashExpr]] remains the cheaper throughput path. */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_md5"

  override protected def nullSafeEval(input: Any): Any =
    graft.datapipe.Hashing.simhashMd5(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.datapipe.Hashing.simhashMd5($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)
}

/** Fused MinHash-LSH band keys of a text column: shingle → 128-perm
  * signature → band hashes in ONE native call per row (the hot stage of
  * LSH dedup). Replaces two chained ScalaUDFs (sig + bands), removing
  * the encoder boundary and the boxed Seq[Long] between them; the
  * result lands as UnsafeArrayData with no per-element boxing.
  * Bit-identical to Hashing.bandKeys(Hashing.minhash(...)). */
case class MinHashBandsExpr(child: Expression, numPerm: Int, shingleN: Int,
    bands: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    graft.datapipe.Hashing.minhashBandsArrayData(
      input.asInstanceOf[UTF8String], numPerm, shingleN, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.datapipe.Hashing.minhashBandsArrayData($c, $numPerm, $shingleN, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** md5-portable variant of [[MinHashBandsExpr]]: band keys from the
  * engine-portable md5 signature (Hashing.minhashBandsMd5 — one
  * md5_number_lower-compatible hash per shingle, (a·x+b) mod 2^61−1
  * permutations), emitted as comma-joined strings the DuckDB oracle
  * recomputes bit-for-bit. Same native, no-UDF call shape as the fnv
  * fast path. */
/** The 128-minimum md5 MinHash signature alone (config-independent) —
  * lets a band-config sweep share one shingle+md5 pass and regroup the
  * minima per config with column ops (q158). */
case class MinHashSigMd5Expr(child: Expression, numPerm: Int, shingleN: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_md5"

  override protected def nullSafeEval(input: Any): Any =
    graft.datapipe.Hashing.minhashSigMd5ArrayData(
      input.asInstanceOf[UTF8String], numPerm, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.datapipe.Hashing.minhashSigMd5ArrayData($c, $numPerm, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMd5Expr =
    copy(child = newChild)
}

case class MinHashBandsMd5Expr(child: Expression, numPerm: Int, shingleN: Int,
    bands: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "minhash_bands_md5"

  override protected def nullSafeEval(input: Any): Any =
    graft.datapipe.Hashing.minhashBandsMd5ArrayData(
      input.asInstanceOf[UTF8String], numPerm, shingleN, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.datapipe.Hashing.minhashBandsMd5ArrayData($c, $numPerm, $shingleN, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsMd5Expr =
    copy(child = newChild)
}

/** k-dim PCA projection of an Array[Float] vector against a LITERAL
  * (mean, basis): out[k] = float(Σᵢ (double(v[i]) − mean_i)·basis_k_i)
  * with each sum accumulated strictly left-to-right — the SAME
  * association order as the q109 oracle's literal term chain, so
  * outputs are bit-identical to an `expr`-built `t0 + t1 + …` form
  * (spec-pinned). The point of the native form is CODEGEN SHAPE: at
  * d=64, k=8 the literal chain is a 512-term Add tree whose generated
  * method blows Janino's limit — the whole stage then falls back and
  * the failed compile is retried on every execution (measured: 7
  * InternalCompilerExceptions per q109 run). This expression generates
  * ONE static call with loops inside: compact, whole-stage-friendly,
  * constant code size for any (d, k). */
case class PcaProjectExpr(child: Expression, mean: Array[Double],
    basis: Array[Array[Double]]) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pca_project requires ARRAY<FLOAT>, got ${other.simpleString}")
    }
  }
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  override protected def nullSafeEval(input: Any): Any =
    PcaProjectExpr.project(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      mean, basis)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val b = ctx.addReferenceObj("pcaBasis", basis, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PcaProjectExpr.project($c, $m, $b)")
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

object PcaProjectExpr {
  /** Loop twin of the literal term chain: acc = t0; acc += t1 … —
    * identical IEEE association to `t0 + t1 + … + t_{d-1}`. */
  def project(v: org.apache.spark.sql.catalyst.util.ArrayData,
      mean: Array[Double],
      basis: Array[Array[Double]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = mean.length
    require(v.numElements() == d,
      s"pca_project: expected $d components, got ${v.numElements()}")
    val out = new Array[Float](basis.length)
    var k = 0
    while (k < basis.length) {
      val row = basis(k)
      var acc = (v.getFloat(0).toDouble - mean(0)) * row(0)
      var i = 1
      while (i < d) {
        acc += (v.getFloat(i).toDouble - mean(i)) * row(i)
        i += 1
      }
      out(k) = acc.toFloat
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** FNV-1a 64-bit hash of a string masked to a power-of-two bucket:
  * `fnv64(s) & mask` — the feature-hashing bucket assignment
  * ([[graft.datapipe.Hashing.fnv64]], codepoint fold) as ONE codegen'd
  * call, for relational per-gram paths (explode → bucket → count)
  * where [[graft.datapipe.Featurize]]'s whole-document UDF loop
  * doesn't apply. Signed-AND with a power-of-two mask ≡ the DuckDB
  * mirror's unsigned `% (mask+1)` (the established Featurize
  * equivalence). */
case class Fnv64MaskExpr(child: Expression, mask: Long)
    extends UnaryExpression {
  require(mask >= 1 && ((mask + 1) & mask) == 0,
    s"mask must be 2^k - 1: $mask")
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64_mask"

  override protected def nullSafeEval(input: Any): Any =
    graft.datapipe.Hashing.fnv64(input.asInstanceOf[UTF8String].toString) & mask

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(graft.datapipe.Hashing.fnv64($c.toString()) & ${mask}L)")

  override protected def withNewChildInternal(newChild: Expression): Fnv64MaskExpr =
    copy(child = newChild)
}

/** Fixed-point binary logarithm of a positive BIGINT:
  * ≈ log2(x) · 2^fracBits as a BIGINT, via the classic integer
  * square-and-shift mantissa algorithm (Q20 mantissa, `fracBits`
  * refinement rounds) — every step is integer arithmetic, so the
  * result is bit-identical on ANY engine that replays the same steps
  * (the DuckDB oracle does, via [[graft.queries.FixedLogSql]]).
  * This is what makes log-domain scores (importance weights,
  * entropies) oracle-checkable: IEEE `ln` differs in ULPs across
  * engines, floored fixed-point log2 does not. Error vs true log2 is
  * < 2 ulps of the Q`fracBits` scale, deterministic.
  *
  * Domain [1, 2^42): enforced with a loud exception (callers guard or
  * +1-shift their counts; 2^42 keeps x·2^20 and m² inside Long).
  * Native expression (not a UDF, not an expr-chain): the unrolled
  * fracBits-round update would otherwise be an exponentially-growing
  * Catalyst tree or a 16-select chain — here it is ONE static call,
  * constant codegen size (the [[PcaProjectExpr]] precedent). */
case class Log2FixedExpr(child: Expression, fracBits: Int)
    extends UnaryExpression {
  require(fracBits >= 1 && fracBits <= 30, s"fracBits out of range: $fracBits")
  override def dataType: DataType = LongType
  override def prettyName: String = "log2_fixed"

  override protected def nullSafeEval(input: Any): Any =
    Log2FixedExpr.log2Fixed(input.asInstanceOf[Long], fracBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Log2FixedExpr.log2Fixed($c, $fracBits)")

  override protected def withNewChildInternal(newChild: Expression): Log2FixedExpr =
    copy(child = newChild)
}

object Log2FixedExpr {
  /** Exclusive input bound: x·2^20 and the Q20 mantissa square must
    * stay inside Long. */
  val MaxInput: Long = 1L << 42

  /** floor-chain fixed-point log2; the single source of truth the
    * codegen path, interpreted path, and spec twins all call. */
  def log2Fixed(x: Long, fracBits: Int): Long = {
    if (x < 1L || x >= MaxInput)
      throw new IllegalArgumentException(
        s"log2_fixed domain is [1, 2^42): $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e <= 20) x << (20 - e) else x >> (e - 20)
    var acc = e.toLong << fracBits
    var j = 1
    while (j <= fracBits) {
      m = (m * m) >> 20
      if (m >= (1L << 21)) { m >>= 1; acc |= 1L << (fracBits - j) }
      j += 1
    }
    acc
  }
}

/** Packed exact-Jaccard counts of two SORTED long-array columns:
  * (n_inter << 32) | n_union as one BIGINT — the verify stage of the
  * exact-similarity-join family run as a codegen'd primitive merge
  * over ArrayData instead of a ScalaUDF that re-shingles both texts
  * per candidate pair. Bit-identical to
  * Hashing.jaccardCounts(shingleSet(a), shingleSet(b)) when fed the
  * per-doc sorted shingle-hash arrays. */
case class JaccardPackExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // analysis-time type pin (r17 ADVICE): the primitive merge reads
  // longs out of ArrayData — any other element type must fail
  // analysis, not ClassCastException (or worse, misread) at runtime
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(LongType),
      org.apache.spark.sql.types.ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_pack"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.datapipe.Hashing.jaccardPackArrayData(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.datapipe.Hashing.jaccardPackArrayData($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardPackExpr =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two float-array columns, codegen'd as a static
  * call over ArrayData — no ScalaUDF encoder boundary, no Seq boxing of
  * the vectors (the hot inner op of every KNN path). Bit-identical to
  * Similarity.cosine. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.datapipe.Similarity.cosineArrayData(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.datapipe.Similarity.cosineArrayData($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Z-value (Morton code) of two int columns: bit-interleave so that
  * sorting by the result clusters rows that are close in BOTH
  * dimensions — the 2-D generalization of sorted compaction. Files
  * written in z-order have tight min/max ranges on BOTH columns, so a
  * 2-D box predicate prunes files on either axis (the Delta/Iceberg
  * OPTIMIZE ZORDER technique, here as one codegen'd expression +
  * repartitionByRange). Inputs are flipped by Int.MinValue so the
  * unsigned interleave respects signed order. */
case class ZOrder2Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // analysis-time contract: ints only. A silent 64-bit cast would wrap
  // and interleave garbage bits; callers with bigint keys must decide
  // how to reduce them (range-check then cast) — see Compaction
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (INT, INT), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}); range-check then cast explicitly")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2Expr.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder2Expr.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2Expr =
    copy(left = newLeft, right = newRight)
}

object ZOrder2Expr {
  /** Spread the 32 bits of `v` into the even bit positions of a long. */
  @inline private def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code with sign-flips so BOTH the signed int inputs and the
    * signed long output sort in true z-order (the interleaved top bit
    * lands on the long's sign bit — flip it back). */
  def interleave(a: Int, b: Int): Long =
    ((spread(a ^ Int.MinValue) << 1) | spread(b ^ Int.MinValue)) ^ Long.MinValue
}

object Expressions {
  import org.apache.spark.sql.graftbridge.Bridge
  def bio_token_count(c: Column): Column =
    Bridge.column(BioTokenCountExpr(Bridge.expression(c)))
  def simhash64(c: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(c)))
  def simhash64_md5(c: Column): Column =
    Bridge.column(SimHashMd5Expr(Bridge.expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(a), Bridge.expression(b)))
  def jaccard_pack(a: Column, b: Column): Column =
    Bridge.column(JaccardPackExpr(Bridge.expression(a), Bridge.expression(b)))
  def minhash_bands(c: Column, numPerm: Int, shingleN: Int, bands: Int): Column =
    Bridge.column(MinHashBandsExpr(Bridge.expression(c), numPerm, shingleN, bands))
  def minhash_sig_md5(c: Column, numPerm: Int, shingleN: Int): Column =
    Bridge.column(MinHashSigMd5Expr(Bridge.expression(c), numPerm, shingleN))
  def minhash_bands_md5(c: Column, numPerm: Int, shingleN: Int, bands: Int): Column =
    Bridge.column(MinHashBandsMd5Expr(Bridge.expression(c), numPerm, shingleN, bands))
  def zorder2(a: Column, b: Column): Column =
    Bridge.column(ZOrder2Expr(Bridge.expression(a), Bridge.expression(b)))
  def log2_fixed(c: Column, fracBits: Int): Column =
    Bridge.column(Log2FixedExpr(Bridge.expression(c), fracBits))
  def fnv64_mask(c: Column, mask: Long): Column =
    Bridge.column(Fnv64MaskExpr(Bridge.expression(c), mask))
  def pca_project(c: Column, mean: Array[Double],
      basis: Array[Array[Double]]): Column =
    Bridge.column(PcaProjectExpr(Bridge.expression(c), mean, basis))
}
