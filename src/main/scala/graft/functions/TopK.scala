package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-side-combining top-k aggregator (custom Aggregator per the
  * Spark-first brief).
  *
  * Replaces the `row_number() OVER (PARTITION BY q ORDER BY score)`
  * formulation of top-k: a window shuffles EVERY candidate row to the
  * key's partition and sorts there — at 100 TB that is the dominant
  * exchange. An Aggregator gets partial aggregation: each map task
  * keeps only its local top-k per key, so at most k rows per key per
  * input partition reach the shuffle. For KNN over N corpus rows × Q
  * queries the exchange shrinks from O(N·Q) rows to O(k·Q·partitions).
  *
  * Ordering: score DESC, then id ASC (deterministic tie-break — same
  * total order the DuckDB oracle uses).
  */
object TopK {

  final case class Scored(score: Double, id: Long)

  final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.length < k) insert(buf, x)
      else if (better(x, buf.last)) insert(buf.dropRight(1), x)
      else buf

    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      // buf kept sorted best-first; binary insertion (k is small)
      val idx = buf.indexWhere(b => better(x, b)) match {
        case -1 => buf.length
        case i => i
      }
      (buf.take(idx) :+ x) ++ buf.drop(idx)
    }

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(reduce)

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column function: top-k (score, id) pairs per group, best first. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), Encoders.product[Scored]).apply(score, id)
}
