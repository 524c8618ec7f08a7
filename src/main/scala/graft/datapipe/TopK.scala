package graft.datapipe

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT a window sort — the 100 TB replacement for
  * `row_number() over (partition by g order by s desc) <= k`.
  *
  * The window form shuffles EVERY row of every group and sorts whole
  * groups just to keep k of them; a skewed group (one source with 80%
  * of a corpus) sorts on one task. This Aggregator keeps a bounded
  * (score, id) buffer of at most k pairs, so it runs as a map-side
  * partial aggregate: each partition contributes at most k pairs per
  * group to the exchange, the shuffle carries O(groups·k·partitions)
  * pairs instead of the corpus, and no task ever holds more than k
  * pairs per group. Merge = merge-two-sorted-truncate, associative and
  * commutative — safe under AQE re-partitioning.
  *
  * Ordering is (score desc, id asc) with ids unique, so the result is
  * total-ordered and deterministic — the q79 DuckDB oracle recomputes
  * it with a plain `row_number()` window.
  *
  * Buffer layout: interleaved [s₀,i₀,s₁,i₁,…] sorted by the pair
  * order, which encodes as a flat `Array[Long]` (no struct encoder on
  * the shuffle path).
  */
object TopK {

  /** true iff pair (s1,i1) orders strictly before (s2,i2). */
  private def before(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** Aggregator over (group, score, id) tuples; group is ignored here
    * (it is the groupByKey key). */
  final class TopKPairsAgg(k: Int)
      extends Aggregator[(String, Long, Long), Array[Long], Array[Long]] {
    require(k >= 1, "top-k needs k >= 1")
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], row: (String, Long, Long)): Array[Long] = {
      val s = row._2; val i = row._3
      val n = buf.length / 2
      // find insert slot (k is small: linear scan beats branchy binary
      // search on an 2k-long primitive array)
      var p = 0
      while (p < n && !before(s, i, buf(2 * p), buf(2 * p + 1))) p += 1
      if (p >= k) buf
      else {
        val m = math.min(n + 1, k)
        val out = new Array[Long](2 * m)
        System.arraycopy(buf, 0, out, 0, 2 * p)
        out(2 * p) = s; out(2 * p + 1) = i
        System.arraycopy(buf, 2 * p, out, 2 * p + 2,
          2 * m - 2 * p - 2)
        out
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val m = math.min(a.length / 2 + b.length / 2, k)
      val out = new Array[Long](2 * m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= b.length / 2 || (i < a.length / 2 &&
          !before(b(2 * j), b(2 * j + 1), a(2 * i), a(2 * i + 1)))
        if (takeA) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
        else { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
        o += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = Enc.arrayLong
    override def outputEncoder: Encoder[Array[Long]] = Enc.arrayLong
  }

  private object Enc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayLong: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    val pairs: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Double-score sibling of [[TopKPairsAgg]] for scores that are not
    * integers (sampling priorities, similarity scores). Same bounded
    * buffer and (score desc, id asc) total order; the buffer encodes
    * as array<struct<double,bigint>>. */
  final class TopKDoubleAgg(k: Int)
      extends Aggregator[(String, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, "top-k needs k >= 1")
    private def beforeD(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(buf: Seq[(Double, Long)], row: (String, Double, Long)): Seq[(Double, Long)] = {
      val s = row._2; val i = row._3
      val p = buf.indexWhere { case (bs, bi) => beforeD(s, i, bs, bi) }
      if (p < 0) { if (buf.size < k) buf :+ ((s, i)) else buf }
      else (buf.take(p) :+ ((s, i))) ++ buf.drop(p).take(k - p - 1)
    }

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = Vector.newBuilder[(Double, Long)]
      var i = 0; var j = 0; var o = 0
      val m = math.min(a.size + b.size, k)
      while (o < m) {
        val takeA = j >= b.size || (i < a.size &&
          !beforeD(b(j)._1, b(j)._2, a(i)._1, a(i)._2))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        o += 1
      }
      out.result()
    }

    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] = Enc.pairs
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = Enc.pairs
  }

  /** Top `k` rows per group by a DOUBLE score (desc, id asc) →
    * (group, rank, id, score). Same one-exchange partial-agg shape as
    * [[topKPerGroup]]. */
  def topKPerGroupByScore(df: DataFrame, groupCol: String, scoreCol: String,
                          idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).cast("string"),
        col(scoreCol).cast("double"), col(idCol).cast("long"))
      .as[(String, Double, Long)]
    ds.groupByKey(_._1)
      .agg(new TopKDoubleAgg(k).toColumn.name("top"))
      .toDF(groupCol, "top")
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as(idCol), col("col._1").as(scoreCol))
  }

  /** MAP-SIDE local top-K prune for LONG group keys — the combiner
    * for a billion-row top-K-per-group. One streaming `mapPartitions`
    * pass holds a bounded (≤ 2k longs) buffer per group key in a
    * per-task hash map (memory ∝ distinct keys in the task's input ×
    * k — e.g. 10⁶ keys × k=5 ≈ 10⁸ bytes — never ∝ rows), emits at
    * most k rows per (partition, key), and never sorts anything.
    * Any row in the GLOBAL top-k of key g is in the top-k of its own
    * partition for g, so `globalTopK(prune(df)) == globalTopK(df)`
    * exactly — run the exact window on the pruned (≤ k·keys·
    * partitions row) output. Rows whose group/score/id is null OR
    * does not cast to a long are EXCLUDED (dropped on both sides of
    * that contract — a raw window over such rows would emit a top-k
    * for the null partition this combiner never sees).
    *
    * Why not the typed Aggregator ([[TopKPairsAgg]]) for this:
    * measured at the q176 100× rehearsal, `groupByKey` over ~10⁹
    * pair rows deserializes every row to objects and falls back to
    * sort-based OBJECT aggregation past the hash-agg group threshold
    * — the resulting GC storm killed the driver (executor heartbeat
    * timeout) where the plain window version merely paid a sort. The
    * Aggregator remains right for model-sized relations (q79/q87);
    * THIS is the corpus-scale path. */
  def localTopKPrune(df: DataFrame, groupCol: String, scoreCol: String,
                     idCol: String, k: Int): DataFrame = {
    require(k >= 1, "top-k needs k >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // filter on the CASTED columns (ADVICE r16): a pre-cast null check
    // missed nulls produced by the cast itself (non-numeric input),
    // which then NPE'd in the primitive-tuple deserializer
    df.select(col(groupCol).cast("long").as("__g"),
        col(scoreCol).cast("long").as("__s"),
        col(idCol).cast("long").as("__i"))
      .filter(col("__g").isNotNull && col("__s").isNotNull &&
        col("__i").isNotNull)
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // primitive-keyed map: a boxed-key HashMap allocates a
        // java.lang.Long PER ROW on the billion-row input
        val m = scala.collection.mutable.LongMap.empty[Array[Long]]
        it.foreach { case (g, s, i) =>
          val buf = m.getOrNull(g)
          if (buf == null) m.update(g, Array(s, i))
          else {
            val n = buf.length / 2
            var p = 0
            while (p < n && !before(s, i, buf(2 * p), buf(2 * p + 1))) p += 1
            if (p < k) {
              val mlen = math.min(n + 1, k)
              val out = new Array[Long](2 * mlen)
              System.arraycopy(buf, 0, out, 0, 2 * p)
              out(2 * p) = s; out(2 * p + 1) = i
              System.arraycopy(buf, 2 * p, out, 2 * p + 2, 2 * mlen - 2 * p - 2)
              m.update(g, out)
            }
          }
        }
        m.iterator.flatMap { case (g, buf) =>
          (0 until buf.length / 2).iterator.map(j =>
            (g, buf(2 * j), buf(2 * j + 1)))
        }
      }
      .toDF(groupCol, scoreCol, idCol)
  }

  /** Top `k` rows per `groupCol` by (`scoreCol` desc, `idCol` asc) →
    * (group, rank, id, score) with rank 1-based. One keyed exchange;
    * partial aggregation below it. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).cast("string"),
        col(scoreCol).cast("long"), col(idCol).cast("long"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .agg(new TopKPairsAgg(k).toColumn.name("top"))
      .toDF(groupCol, "top")
      // buf is never empty (every group has >= 1 reduced row), so the
      // sequence bound size/2 - 1 is >= 0
      .select(col(groupCol), posexplode(expr(
        "transform(sequence(0, int(size(top)/2) - 1), " +
          "j -> struct(top[2*j] AS s, top[2*j+1] AS i))")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.i").as(idCol), col("col.s").as(scoreCol))
  }
}
