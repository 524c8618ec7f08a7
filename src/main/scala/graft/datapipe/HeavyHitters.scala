package graft.datapipe

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale via candidate-then-verify — the same
  * philosophy as the LSH dedup family: a cheap bounded-state pass
  * proposes candidates with a no-false-negative guarantee, an exact
  * pass verifies them.
  *
  * Why not one `groupBy(term).count()`: on a 100 TB corpus that
  * shuffles the ENTIRE vocabulary (billions of distinct terms, heavy
  * skew) to answer a question whose output is a handful of rows. The
  * Misra-Gries summary instead carries at most k (term, count) pairs
  * per partition through a map-side partial aggregate — the exchange
  * moves O(partitions·k) state — and guarantees every term with true
  * frequency > n/(k+1) survives (Misra & Gries 1982; merge form
  * Agarwal et al., PODS'12: sum summaries, subtract the (k+1)-th
  * largest count, drop non-positives — still no false negatives).
  * Pass 2 then counts ONLY the ≤ k candidates exactly (broadcast
  * semi-join, partial-aggregated) and applies the exact threshold.
  *
  * The final output is therefore EXACT and independent of partition
  * and merge order — the MG summary's order-dependent internals never
  * reach it. The threshold test is integer cross-multiplication
  * (count·denom ≥ n), bit-portable to any oracle.
  */
object HeavyHitters {

  /** Misra-Gries summary as a mergeable typed Aggregator: at most k
    * retained (term, count) pairs. */
  final class MgAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Array[String]] {
    require(k >= 1, "MG needs k >= 1")
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], term: String): Map[String, Long] = {
      buf.get(term) match {
        case Some(c) => buf.updated(term, c + 1)
        case None if buf.size < k => buf.updated(term, 1L)
        case None =>
          // decrement all; drop zeros (classic MG step)
          buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // keep the k largest after subtracting the (k+1)-th count
        val counts = sum.values.toArray.sortInPlace()(Ordering[Long].reverse)
        val sub = counts(k)
        sum.flatMap { case (t, c) => if (c > sub) Some(t -> (c - sub)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Array[String] =
      buf.keys.toArray.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] = Enc.mapStringLong
    override def outputEncoder: Encoder[Array[String]] = Enc.arrayString
  }

  private object Enc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val mapStringLong: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    val arrayString: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
  }

  /** Exact (term, n) for every term in `termCol` of `terms` whose
    * count satisfies count·denom ≥ total·num — e.g. num=1, denom=100
    * keeps terms that are ≥ 1% of all occurrences. `sketchK` must
    * exceed denom/num (guarantee bound n/(k+1) < n·num/denom) — this
    * is asserted. */
  def frequentTerms(terms: DataFrame, termCol: String,
                    num: Long, denom: Long, sketchK: Int): DataFrame = {
    require((sketchK + 1) * num > denom,
      s"sketchK=$sketchK too small for threshold $num/$denom " +
        s"(needs (k+1)·$num > $denom)")
    val spark = terms.sparkSession
    import spark.implicits._
    val toks = terms.select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull)
    // pass 1: bounded-state candidates (one row: array of ≤ k terms)
    val candidates = toks.as[String]
      .select(new MgAgg(sketchK).toColumn.name("cands"))
      .select(explode(col("cands")).as("term"))
    // pass 2: exact counts of candidates only + exact total, integer
    // cross-multiplied threshold
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(broadcast(candidates), "term")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .join(broadcast(total))
      .filter(col("n") * lit(denom) >= col("total") * lit(num))
      .select(col("term"), col("n"))
  }
}
