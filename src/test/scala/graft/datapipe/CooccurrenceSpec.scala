package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.Log2FixedExpr.log2Fixed

class CooccurrenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def run(window: Int, topK: Int, docs: (Long, String)*): Seq[(String, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    Cooccurrence.pmiPairs(docs.toDF("doc_id", "text"), window, topK)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
  }

  /** Independent mirror: plain-Scala sliding window + the Q16 chain. */
  def mirror(window: Int, topK: Int, docs: Seq[(Long, String)]): Seq[(String, String, Long, Long, Long, Long)] = {
    val ev = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split("[ \t\n\r\f]+").toSeq
      for {
        i <- toks.indices if toks(i).nonEmpty
        j <- (i + 1) to math.min(i + window, toks.size - 1)
        if toks(j).nonEmpty
      } yield {
        val (a, b) = (toks(i), toks(j))
        if (a <= b) (a, b) else (b, a)
      }
    }
    val n = ev.size.toLong
    val pc = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val marg = ev.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(topK)
      .map { case ((a, b), c) =>
        (a, b, c, marg(a), marg(b),
          log2Fixed(c, 16) + log2Fixed(n, 16) -
            log2Fixed(marg(a), 16) - log2Fixed(marg(b), 16))
      }
  }

  test("matches the independent mirror, including repeated tokens") {
    val docs = Seq(
      1L -> "new york city in new york state",
      2L -> "the city of new york",
      3L -> "the the the rain in spain")
    assert(run(4, 50, docs: _*) == mirror(4, 50, docs))
  }

  test("window=1 counts adjacent pairs only") {
    val got = run(1, 10, 1L -> "a b c d a b")
    val pairs = got.map(t => (t._1, t._2, t._3))
    assert(pairs.contains(("a", "b", 2L)))
    assert(pairs.contains(("b", "c", 1L)))
    assert(pairs.contains(("a", "d", 1L))) // "d a" is adjacent
    assert(!pairs.exists(p => p._1 == "a" && p._2 == "c")) // distance 2
  }

  test("collocation outscores a frequent-frequent pair") {
    // 'x y' always together; 'p'/'q' frequent but independent
    val docs = (1L to 8L).map(i => i -> s"x y p q${i % 4} p q${(i + 1) % 4} p")
    val got = run(2, 50, docs: _*)
    val byPair = got.map(t => (t._1, t._2) -> t._6).toMap
    assert(byPair(("x", "y")) > byPair(("p", "p")))
  }

  test("invariant to input partitioning") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => i -> s"w${i % 5} w${i % 3} w${i % 7} w${i % 5}")
    val df = docs.toDF("doc_id", "text")
    val one = Cooccurrence.pmiPairs(df.coalesce(1), 3, 30).collect().toSeq.map(_.toSeq)
    val many = Cooccurrence.pmiPairs(df.repartition(11), 3, 30).collect().toSeq.map(_.toSeq)
    assert(one == many)
  }
}
