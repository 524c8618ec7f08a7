package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def edgeDf(pairs: (String, String)*) = {
    import spark.implicits._
    val sym = pairs ++ pairs.map { case (a, b) => (b, a) }
    sym.toDF("src", "dst")
  }

  /** Independent driver-side mirror of the exact-integer recurrence
    * (plain Scala maps — shares no code with the DataFrame path). */
  def mirror(pairs: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val edges = (pairs ++ pairs.map { case (a, b) => (b, a) })
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    val base = 15L * PageRank.Fp / (100L * n)
    var r = deg.keys.map(k => k -> PageRank.Fp / n).toMap
    for (_ <- 1 to iters) {
      val contrib = r.map { case (k, v) => k -> v / deg(k) }
      r = edges.groupBy(_._2).map { case (v, es) =>
        v -> (base + 85L * es.map(e => contrib(e._1)).sum / 100L)
      }
    }
    r
  }

  test("matches the independent integer mirror on a small graph") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d", "a" -> "c")
    val got = PageRank.pageRankFixed(edgeDf(pairs: _*), iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == mirror(pairs, 8))
  }

  test("hub of a star has the highest rank") {
    val pairs = (1 to 10).map(i => "hub" -> s"leaf$i")
    val got = PageRank.pageRankFixed(edgeDf(pairs: _*), iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hub") > got("leaf1"))
    assert((1 to 10).map(i => got(s"leaf$i")).distinct.size == 1)
  }

  test("total mass is conserved up to truncation loss") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val got = PageRank.pageRankFixed(edgeDf(pairs: _*), iters = 16)
      .agg(sum(col("r"))).head().getLong(0)
    // each truncating division loses < 1 unit per operand: per
    // iteration ≤ |E| (contrib) + 2·N (damp + base) units, so after
    // 16 iterations the deficit is ≪ 10⁴ against Fp ≈ 1.1·10¹²
    assert(got <= PageRank.Fp)
    assert(got > PageRank.Fp - 10000L)
  }

  test("result is invariant to input partitioning") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val df = edgeDf(pairs: _*)
    val one = PageRank.pageRankFixed(df.coalesce(1), 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val many = PageRank.pageRankFixed(df.repartition(7), 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(one == many)
  }
}
