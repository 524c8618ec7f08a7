package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** q103: the six-stage funnel's end-state invariants (the oracle gate
  * proves value equality; this pins the PROPERTIES the pipeline
  * exists to deliver). */
class LlmFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.01"

  lazy val out = DataPipeQueries.llmFunnel(spark, sfDir).collect()
  lazy val ids = out.map(_.getLong(0)).toSet

  test("funnel keeps a non-trivial subset and never an eval doc") {
    assert(out.nonEmpty && out.length < 500)
    assert(ids.forall(_ % 97 != 0), "eval slice must be excluded")
  }

  test("no same-cluster cosine near-dup pair survives") {
    val emb = graft.util.Tables.embeddings(spark, sfDir)
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.datapipe.Similarity
      .cosineNearDupPairs(emb, threshold = 0.45, nCells = 23)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(ids.contains(a) && ids.contains(b) && cluster(a) == cluster(b)),
        s"same-cluster pair ($a,$b) survived semantic dedup")
    }
  }

  test("no surviving cosine pair straddles the split (leak-free by construction)") {
    val emb = graft.util.Tables.embeddings(spark, sfDir)
    val split = out.map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = graft.datapipe.Similarity
      .cosineNearDupPairs(emb, threshold = 0.45, nCells = 23)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => ids.contains(a) && ids.contains(b) }
    // on this corpus every cosine near-dup happens to be same-cluster
    // (pairs is then empty and the property vacuous here — q101's spec
    // proves the component-split mechanics against real straddling
    // pairs); the invariant still must hold for whatever remains
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
    }
    // and the component labels group whatever pairs exist
    val component = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) => assert(component(a) == component(b)) }
  }
}
