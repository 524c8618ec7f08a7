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
    * (plain Scala maps — shares no code with the DataFrame path).
    * `seeds` non-empty mirrors the personalized variant. */
  def mirror(pairs: Seq[(String, String)], iters: Int,
      seeds: Set[String] = Set.empty): Map[String, Long] = {
    val edges = (pairs ++ pairs.map { case (a, b) => (b, a) })
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    def base(v: String): Long =
      if (seeds.isEmpty) 15L * PageRank.Fp / (100L * n)
      else if (seeds(v)) 15L * PageRank.Fp / (100L * seeds.size) else 0L
    var r = deg.keys.map { k =>
      k -> (if (seeds.isEmpty) PageRank.Fp / n
            else if (seeds(k)) PageRank.Fp / seeds.size else 0L)
    }.toMap
    for (_ <- 1 to iters) {
      val contrib = r.map { case (k, v) => k -> v / deg(k) }
      r = edges.groupBy(_._2).map { case (v, es) =>
        v -> (base(v) + 85L * es.map(e => contrib(e._1)).sum / 100L)
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

  test("personalized PR matches the seeded mirror and localizes mass") {
    import org.apache.spark.sql.functions.col
    // a path graph: a - b - c - d - e, seed at a
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    // integer ids for the seeded DataFrame path
    val ids = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "e" -> 5L)
    import spark.implicits._
    val sym = (pairs ++ pairs.map(_.swap))
      .map { case (x, y) => (ids(x), ids(y)) }.toDF("src", "dst")
    val got = PageRank.pageRankFixed(sym, 8, seeds = Seq(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = mirror(pairs, 8, seeds = Set("a"))
      .map { case (k, v) => ids(k) -> v }
    assert(got == expect)
    // proximity: the seed dominates, and among equal-degree interior
    // nodes rank decays with walk distance (endpoints b/d both deg 2,
    // a/e both deg 1 — degree-matched pairs, since the stationary
    // walk weights by degree)
    assert(got(1L) > got(2L) && got(2L) > got(4L) && got(1L) > got(5L))
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
