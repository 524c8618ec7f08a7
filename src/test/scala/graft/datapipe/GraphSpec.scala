package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def census(pairs: (Long, Long)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Graph.triangleCensus(pairs.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  /** Independent plain-Scala mirror: brute-force triple scan. */
  def mirror(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val es = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val nodes = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val deg = nodes.map(n => n -> es.count(p => p._1 == n || p._2 == n).toLong).toMap
    val tris = for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } yield Seq(a, b, c)
    val tcnt = tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.map { n =>
      val d = deg(n); val t = tcnt.getOrElse(n, 0L)
      n -> ((d, t, if (d >= 2) 2L * t * Graph.CcFp / (d * (d - 1)) else 0L))
    }.toMap
  }

  test("K4: every node has 3 triangles and cc = 1.0") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = census(k4: _*)
    assert(got.size == 4)
    got.values.foreach { case (d, t, cc) =>
      assert(d == 3L && t == 3L && cc == Graph.CcFp)
    }
  }

  test("star graph: no triangles, hub cc = 0") {
    val star = (2L to 8L).map(i => (1L, i))
    val got = census(star: _*)
    assert(got(1L) == ((7L, 0L, 0L)))
    assert(got(5L) == ((1L, 0L, 0L)))
  }

  test("matches the brute-force mirror on an irregular graph") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 3L, 5L -> 6L, 6L -> 7L, 7L -> 5L, 1L -> 7L, 2L -> 7L, 1L -> 4L)
    assert(census(pairs: _*) == mirror(pairs))
  }

  def lpa(iters: Int, pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    val sym = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    Graph.labelPropagation(sym, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Independent plain-Scala mirror of the deterministic update rule:
    * argmax neighbor+self label count, ties to the smallest label. */
  def lpaMirror(iters: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var l = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      l = adj.map { case (v, ns) =>
        val votes = (ns.map(l) :+ l(v)).groupBy(identity)
          .view.mapValues(_.size).toMap
        val best = votes.values.max
        v -> votes.filter(_._2 == best).keys.min
      }
    }
    l
  }

  test("label propagation recovers planted communities") {
    // two 5-cliques bridged by one edge
    val cliqueA = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val cliqueB = for (a <- 11L to 15L; b <- (a + 1) to 15L) yield (a, b)
    val got = lpa(8, (cliqueA ++ cliqueB :+ (5L -> 11L)): _*)
    assert((1L to 5L).map(got).distinct.size == 1)
    assert((11L to 15L).map(got).distinct.size == 1)
    assert(got(1L) != got(11L))
  }

  test("label propagation matches the independent mirror") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L,
      5L -> 6L, 6L -> 4L, 2L -> 7L, 7L -> 8L)
    for (t <- Seq(1, 3, 8))
      assert(lpa(t, pairs: _*) == lpaMirror(t, pairs), s"iters=$t")
  }

  test("label propagation is invariant to input partitioning") {
    import spark.implicits._
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 5L -> 1L)
    val sym = (pairs ++ pairs.map(_.swap))
    val a = Graph.labelPropagation(sym.toDF("src", "dst").coalesce(1), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.labelPropagation(sym.toDF("src", "dst").repartition(9), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  def walks(steps: Int, pairs: (Long, Long)*): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    val sym = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    Graph.randomWalks(sym, steps).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  /** Independent walk mirror: MessageDigest md5, BigInt hex parse,
    * sorted-neighbor indexing — shares nothing with the Column path. */
  def walkMirror(steps: Int, pairs: Seq[(Long, Long)]): Seq[(Long, Int, Long)] = {
    val adj = (pairs ++ pairs.map(_.swap)).distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    adj.keys.toSeq.sorted.flatMap { start =>
      var v = start
      (0 to steps).map { t =>
        if (t > 0) {
          val ns = adj(v)
          v = ns((h(s"w$start:$t") % ns.size).toInt)
        }
        (start, t, v)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("random walks match the independent md5 mirror") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L,
      4L -> 5L, 5L -> 6L)
    assert(walks(6, pairs: _*) == walkMirror(6, pairs))
  }

  test("every walk step follows an edge") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
    val es = (pairs ++ pairs.map(_.swap)).toSet
    val byWalk = walks(5, pairs: _*).groupBy(_._1)
    byWalk.values.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      assert(path.head == w.head._1)
      path.sliding(2).foreach { case Seq(a, b) => assert(es((a, b))) }
    }
  }

  test("walks are invariant to input partitioning") {
    import spark.implicits._
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val sym = pairs ++ pairs.map(_.swap)
    val a = Graph.randomWalks(sym.toDF("src", "dst").coalesce(1), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val b = Graph.randomWalks(sym.toDF("src", "dst").repartition(8), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }

  test("incremental census equals one-shot, incl. all-new-edge triangles") {
    import spark.implicits._
    val all = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 3L, 5L -> 6L, 6L -> 7L, 7L -> 5L, 1L -> 7L, 2L -> 7L, 1L -> 4L)
    // splits exercising 1-, 2- and 3-new-edge triangles + brand-new nodes
    for (nBase <- Seq(0, 3, 6, 9, 12)) {
      val base = all.take(nBase).toDF("u", "v")
      val delta = all.drop(nBase).toDF("u", "v")
      val inc = Graph
        .triangleCensusInc(Graph.triangleCensus(base), base, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
      val full = Graph.triangleCensus(all.toDF("u", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
      assert(inc == full, s"nBase=$nBase")
    }
  }

  test("invariant to partitioning, edge direction and duplicate edges") {
    import spark.implicits._
    val pairs = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 1L -> 4L)
    val base = census(pairs: _*)
    val messy = (pairs ++ pairs.map(_.swap) ++ pairs).toDF("u", "v")
      .repartition(7)
    val got = Graph.triangleCensus(messy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == base)
  }
}
