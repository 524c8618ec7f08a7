package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Large-star/small-star connected components vs a brute-force
  * union-find, on shapes that stress the algorithm: long chains
  * (pairwise-chained similarity), stars, cycles, singletons, and a
  * seeded random graph. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to min root
    n.map(x => x -> find(x)).toMap
  }

  def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
  }

  test("chain: pairwise-linked cluster collapses to its min id") {
    val chain = (1L to 20L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(chain)
    assert((1L to 20L).forall(got(_) == 1L), got)
  }

  test("two components + cycle + star") {
    val edges = Seq((5L, 3L), (3L, 9L), (9L, 5L), // cycle -> comp 3
      (20L, 21L), (20L, 22L), (20L, 23L)) // star -> comp 20
    val got = run(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L), got)
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val nodes = (0L until 200L).toSeq
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val got = run(edges)
    val want = unionFind(nodes, edges)
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(touched.forall(n => got(n) == want(n)),
      touched.filter(n => got(n) != want(n)).take(5).map(n => (n, got(n), want(n))))
  }

  test("singletons map to themselves via componentsWithSingletons") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val edges = Seq((1L, 3L)).toDF("u", "v")
    val got = ConnectedComponents.componentsWithSingletons(nodes, "doc_id", edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L, 5L -> 5L), got)
  }
}
