package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate distinct counting via a K-Minimum-Values sketch — the
  * 100 TB answer to "how many distinct users/tokens/urls" when an
  * exact `COUNT(DISTINCT x)` would shuffle every distinct value.
  *
  * Why KMV and not HyperLogLog here: the sketch state is the k
  * smallest distinct hash values, which is (a) MERGEABLE — merge =
  * union-then-truncate, so it runs as a map-side partial aggregate
  * with O(k) state per partition and only numPartitions·k values ever
  * cross the wire; (b) DETERMINISTIC AND ENGINE-PORTABLE — the hash is
  * `md5(key)`'s first 15 hex digits parsed as a 60-bit integer, which
  * any engine with md5 reproduces bit-for-bit (the driver's DuckDB
  * oracle recomputes the identical estimate, q56); Spark's own
  * `approx_count_distinct` (HLL++) is neither portable nor
  * specified across versions. Estimator: with v = k-th smallest of n
  * distinct uniform hashes in [0, 2⁶⁰), E[v/2⁶⁰] ≈ k/(n+1), so
  * n̂ = (k-1)/(v/2⁶⁰) (the unbiased form; Bar-Yossef et al. 2002).
  * Relative error ~ 1/√k (k = 256 → ~6%).
  *
  * The estimate expression divides by the EXACT power 2⁶⁰ first
  * (exact in binary floating point), then divides — one rounding per
  * operation, bit-identical on any IEEE-754 engine evaluating the
  * same tree.
  */
object Sketches {

  /** Engine-portable 60-bit uniform hash: first 15 hex digits of
    * md5(key as string). Pure built-ins — whole-stage codegen'd.
    * (DuckDB: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.) */
  def kmvHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Sketch state: the (≤ k) smallest distinct hashes, sorted asc. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, "KMV needs k >= 2")
    override def zero: Array[Long] = Array.emptyLongArray

    // insert one hash, keep the k smallest distinct (sorted buffer)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (ins >= k) buf // larger than current k-th: no-op
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    // merge = sorted-union, truncate to k
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      var last = Long.MinValue; var first = true
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (first || v != last) { out(o) = v; o = o + 1; last = v; first = false }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExprEnc.arrayLong
    override def outputEncoder: Encoder[Array[Long]] = ExprEnc.arrayLong
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayLong: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** [[KmvAgg]] over (group, hash) tuples — the shape
    * `ds.groupByKey(_._1).agg(...)` needs, so ONE pass builds a sketch
    * per group (map-side partial aggregation, O(k) state per group)
    * instead of one filtered job per slice. This is the 100 TB shape
    * for "sketch every slice of a dimension". */
  final class KmvKeyedAgg(k: Int)
      extends Aggregator[(String, Long), Array[Long], Array[Long]] {
    private val inner = new KmvAgg(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(buf: Array[Long], a: (String, Long)): Array[Long] =
      inner.reduce(buf, a._2)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExprEnc.arrayLong
    override def outputEncoder: Encoder[Array[Long]] = ExprEnc.arrayLong
  }

  def kmvSketchKeyed(k: Int): TypedColumn[(String, Long), Array[Long]] =
    new KmvKeyedAgg(k).toColumn

  /** Set-operation estimate fixed-point scale: ×2¹⁰. */
  val KmvEstFp = 1024L

  /** Exact-integer set-operation estimates from two KMV sketches
    * (Beyer et al. 2007) — the shared q146/q154 driver math:
    * (n_u, kth_u, n_common, est_union_fp, est_inter_fp, jaccard_fp),
    * estimates ×2¹⁰ with truncating division. When the union sketch
    * holds fewer than k hashes it IS the union and every output is
    * exact. */
  def kmvSetStats(a: Array[Long], b: Array[Long],
      k: Int): (Long, Long, Long, Long, Long, Long) = {
    val merged = new KmvAgg(k).merge(a, b)
    val inA = a.toSet; val inB = b.toSet
    val nU = merged.length.toLong
    val kthU = if (merged.nonEmpty) merged.last else 0L
    val nCommon = merged.count(h => inA(h) && inB(h)).toLong
    val estU =
      if (nU < k) nU * KmvEstFp
      else (BigInt(k - 1) * (BigInt(1) << 60) * KmvEstFp / kthU).toLong
    val estI =
      if (nU < k) nCommon * KmvEstFp
      else (BigInt(estU) * nCommon / k).toLong
    val jac = if (nU > 0) nCommon * KmvEstFp / nU else 0L
    (nU, kthU, nCommon, estU, estI, jac)
  }

  /** The sketch as a typed aggregation column over a hash column
    * (use with `df.select(kmvHash(col("x")).as[Long]).agg(...)` or any
    * `groupBy` — partial aggregation and AQE apply as with any agg). */
  def kmvSketch(k: Int): TypedColumn[Long, Array[Long]] =
    new KmvAgg(k).toColumn

  /** One-row distinct-count estimate for `keyCol` of `df`:
    * (key_name, n_kept, kth_hash, est_distinct). When fewer than k
    * distinct hashes exist the sketch IS the distinct set and the
    * estimate is exact. */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int,
      label: String = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val name = if (label == null) keyCol else label
    val sketch = df.select(kmvHash(col(keyCol)).as("h"))
      .filter(col("h").isNotNull)
      .as[Long]
      .select(kmvSketch(k).name("mins"))
    sketch.select(
      lit(name).as("key_name"),
      size(col("mins")).cast("long").as("n_kept"),
      array_max(col("mins")).as("kth_hash"),
      when(size(col("mins")) < k, size(col("mins")).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (array_max(col("mins")).cast("double") / lit(1152921504606846976.0d)))
        .as("est_distinct"))
  }

  /** DuckDB oracle for one [[kmvDistinct]] row: same hash, same
    * k-smallest-distinct, same estimate expression. `keyExpr` is the
    * SQL expression for the key cast to VARCHAR the way Spark casts it
    * (BIGINT→VARCHAR prints identically). */
  def kmvOracle(table: String, keyExpr: String, k: Int, label: String,
      where: String = "TRUE"): String =
    s"""SELECT '$label' AS key_name,
       |  CAST(COUNT(*) AS BIGINT) AS n_kept,
       |  MAX(h) AS kth_hash,
       |  CASE WHEN COUNT(*) < $k THEN CAST(COUNT(*) AS DOUBLE)
       |    ELSE CAST(${k - 1} AS DOUBLE) /
       |      (CAST(MAX(h) AS DOUBLE) / 1152921504606846976.0) END AS est_distinct
       |FROM (
       |  SELECT DISTINCT CAST('0x' || substr(md5($keyExpr), 1, 15) AS BIGINT) AS h
       |  FROM $table WHERE ($keyExpr) IS NOT NULL AND $where
       |  ORDER BY h LIMIT $k
       |)""".stripMargin

  /** HyperLogLog register width: m = 2⁶ = 64 registers (p = 6). The
    * [[kmvHash]] 60-bit value splits into a 6-bit register index (top
    * bits) and a 54-bit suffix whose leading-zero rank feeds the
    * register. */
  val HllP = 6
  val HllM: Int = 1 << HllP // 64
  val HllRestBits: Int = 60 - HllP // 54
  val HllRhoMax: Int = HllRestBits + 1 // 55 (all-zero suffix)

  /** HyperLogLog registers (Flajolet et al. 2007) over `keyCol`,
    * engine-portable: hash = [[kmvHash]] (md5-based — DuckDB replays
    * it bit-for-bit, unlike Spark's own HLL++ whose sketch bytes are
    * version-private), register = top 6 hash bits, ρ = 1-based
    * position of the first 1-bit in the remaining 54
    * (= 55 − bitlength(suffix), via `bin()` — present in BOTH
    * engines with no leading zeros).
    *
    * Returns the NON-EMPTY registers only, (key_name, idx, m): a
    * ≤ 64-row relation per key. This is the part that touches all
    * 100 TB — one codegen'd md5 per row and a 64-group max with
    * map-side partial combine, so per-partition state is ≤ 64 longs
    * and merge is register-wise MAX (the HLL mergeability property,
    * expressed as an ordinary groupBy-max). KMV (q56) estimates
    * distinct counts too; HLL completes the family with O(m) FIXED
    * state — at a billion distinct keys KMV's k-smallest set is the
    * same size but HLL's registers never exceed 64 bytes-ish and the
    * estimate error is known (~1.04/√m). */
  def hllRegisters(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val h = kmvHash(col(keyCol))
    val rest = h.bitwiseAND(lit((1L << HllRestBits) - 1))
    df.filter(col(keyCol).isNotNull)
      .select(shiftright(h, HllRestBits).as("idx"),
        when(rest === 0, lit(HllRhoMax.toLong))
          .otherwise(lit(HllRhoMax.toLong) - length(bin(rest)).cast("long"))
          .as("rho"))
      .groupBy(col("idx")).agg(max(col("rho")).as("m"))
      .select(lit(label).as("key_name"), col("idx"), col("m"))
  }

  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005) over a key
    * stream, built RELATIONALLY: the sketch is the (row_idx, bucket,
    * cnt) relation itself — at most depth·width rows — and each
    * partition's partial-aggregation state is bounded by the same
    * depth·width regardless of stream length, so the one exchange
    * carries sketch-sized rows, never the keys. (A typed Aggregator
    * would hold the identical d×w array per partition; the relational
    * form gets the same bound from hash-aggregate partial combine
    * while staying in whole-stage codegen and keeping the sketch
    * itself queryable/joinable — the mergeability of CMS IS ordinary
    * `sum` over the bucket relation.)
    *
    * Hash row j of key t = the engine-portable [[kmvHash]] of
    * "j:t" mod width — depth independent-by-construction md5 rows any
    * engine reproduces bit-for-bit (pairwise-independence in the CMS
    * bound is satisfied by md5's avalanche in practice; the bound
    * est ≤ true + εN holds per row regardless).
    *
    * Completes the sketch family: KMV (how many distinct), Misra-Gries
    * (which items are frequent), CMS (how often is ANY item, point
    * query, with one-sided error: never an undercount). */
  def cmsSketch(items: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1, s"CMS depth must be >= 1: $depth")
    require(width >= 2, s"CMS width must be >= 2: $width")
    items
      .filter(col(keyCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row_idx"),
        col(keyCol).as("__k"))
      .select(col("row_idx"),
        pmod(kmvHash(concat(col("row_idx").cast("string"), lit(":"),
          col("__k").cast("string"))), lit(width.toLong)).as("bucket"))
      .groupBy(col("row_idx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the CMS: est(t) = min over rows of the counter at
    * (j, bucket_j(t)) — the classic one-sided estimate (est ≥ true
    * count; overestimate ≤ εN per row with ε = e/width). Probes join
    * the (small) sketch relation; missing buckets count 0. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val probed = probes
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("row_idx"))
      .select(col(keyCol), col("row_idx"),
        pmod(kmvHash(concat(col("row_idx").cast("string"), lit(":"),
          col(keyCol).cast("string"))), lit(width.toLong)).as("bucket"))
    probed.join(sketch, Seq("row_idx", "bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
