package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.datapipe.Graph

/** [[GraphSketchQueries.clusterQuality]] (q166): the decision table
  * must separate auto-mergeable cliques from transitivity chains —
  * the negative path the bench corpus (all cliques at sf0.1) doesn't
  * exercise. */
class ClusterQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def card(pairs: (Long, Long)*): Map[Long, (Long, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    GraphSketchQueries.clusterQuality(pairs.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  test("clique auto-merges; chain of borderline pairs does not") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq(10L -> 11L, 11L -> 12L, 12L -> 13L, 13L -> 14L)
    val got = card(k4 ++ chain: _*)
    assert(got.keySet == Set(1L, 10L))
    // K4: 4 nodes, 6 edges, 4 triangles, density 1.0 → auto-merge
    assert(got(1L) == ((4L, 6L, 4L, Graph.CcFp, true)))
    // 5-node chain: 4 edges, 0 triangles, density 4/10 → review
    assert(got(10L) == ((5L, 4L, 0L, 4L * Graph.CcFp / 10L, false)))
  }

  test("pair components are (trivially) cliques; braided chain is in between") {
    val pair = Seq(1L -> 2L)
    // chain with one triangle braided in: 4 nodes, 4 edges, 1 triangle
    val braid = Seq(20L -> 21L, 21L -> 22L, 20L -> 22L, 22L -> 23L)
    val got = card(pair ++ braid: _*)
    assert(got(1L) == ((2L, 1L, 0L, Graph.CcFp, true)))
    val (n, e, t, d, am) = got(20L)
    assert(n == 4L && e == 4L && t == 1L && !am)
    assert(d == 2L * 4L * Graph.CcFp / (4L * 3L))
  }
}
