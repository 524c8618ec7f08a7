package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.util.Tables

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Driver-side reference Lloyd on quantized vectors — the exact
    * semantics kmeansAssign claims: floor(x·2²⁰) quantize, smallest-k
    * init, lowest-index argmin ties, floorDiv centroid update,
    * emptied cluster keeps its centroid. */
  def referenceKmeans(rows: Array[(Long, Array[Long])], k: Int,
      iters: Int): Map[Long, (Int, Long)] = {
    val sorted = rows.sortBy(_._1)
    var cs: Array[Array[Long]] = sorted.take(k).map(_._2.clone())
    def assign(v: Array[Long]): (Int, Long) = {
      var best = 0; var bestD = Long.MaxValue
      for (j <- cs.indices) {
        var dd = 0L
        for (i <- v.indices) { val t = v(i) - cs(j)(i); dd += t * t }
        if (dd < bestD) { bestD = dd; best = j }
      }
      (best, bestD)
    }
    for (_ <- 0 until iters) {
      val byCl = rows.groupBy(r => assign(r._2)._1)
      cs = cs.indices.map { j =>
        byCl.get(j) match {
          case Some(members) =>
            val d = members.head._2.length
            Array.tabulate(d) { i =>
              Math.floorDiv(members.map(_._2(i)).sum, members.length.toLong)
            }
          case None => cs(j)
        }
      }.toArray
    }
    rows.map { case (id, v) => id -> { val (c, dd) = assign(v); (c, dd) } }.toMap
  }

  def quantized(): Array[(Long, Array[Long])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Clustering.quantize(col("embedding")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)

  test("kmeansAssign equals the driver-side reference Lloyd on the real table") {
    val expected = referenceKmeans(quantized(), k = 8, iters = 3)
    val got = Clustering.kmeansAssign(Tables.embeddings(spark, sfDir),
      k = 8, iters = 3).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (c, dd) = expected(r.getLong(0))
      assert(r.getLong(1) == c && r.getLong(2) == dd,
        s"vec ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), want ($c, $dd)")
    }
  }

  test("assignment is invariant under physical repartitioning") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Clusterings(emb)
    val b = Clusterings(emb.repartition(7))
    assert(a == b)
    assert(a == Clusterings(emb.repartition(1)))
  }

  private def Clusterings(df: org.apache.spark.sql.DataFrame) =
    Clustering.kmeansAssign(df, k = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("an emptied cluster keeps its previous centroid (no crash, stable result)") {
    import spark.implicits._
    // two tight groups far apart, but k = 4: the two extra centroids
    // (inited on ids 2 and 3, inside group one) lose all their points
    // after the first update pulls centroid 0/1 onto the group means
    val vs = Seq(
      0L -> Array(0f, 0f), 1L -> Array(0.01f, 0f), 2L -> Array(0.02f, 0f),
      3L -> Array(0.03f, 0f), 4L -> Array(10f, 10f), 5L -> Array(10.01f, 10f))
    val df = vs.toDF("vec_id", "embedding")
    val out = Clustering.kmeansAssign(df, k = 4, iters = 3).collect()
    assert(out.length == vs.length)
    // the far group must share one cluster, the near group stays split
    // across the surviving near centroids — but every row is assigned
    val far = out.filter(_.getLong(0) >= 4).map(_.getLong(1)).toSet
    assert(far.size == 1)
  }

  test("semantic dedup drops exactly the same-cluster smaller-id neighbors") {
    import spark.implicits._
    // group A: three near-identical vectors (ids 0,1,2) — same cluster,
    // keep-first ⇒ only id 0 survives; group B: two orthogonal-ish
    // vectors far from A (ids 3,4) below threshold to each other
    val vs = Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(0.999f, 0.001f, 0f),
      2L -> Array(0.998f, 0.002f, 0f),
      3L -> Array(0f, 1f, 0f), 4L -> Array(0f, 0f, 1f))
    val df = vs.toDF("vec_id", "embedding")
    val kept = Clustering.semanticDedupSurvivors(df, threshold = 0.9,
      k = 2, iters = 2, nCells = 2).collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("final assignment plan reads the persisted projection without an exchange") {
    val out = Clustering.kmeansAssign(Tables.embeddings(spark, sfDir),
      k = 4, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment should be a narrow map over the cached projection:\n$plan")
  }
}
