package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.datapipe.Graph

/** The streaming triangle-census state machine, driven through
  * applyGraphCensusBatch directly (the applyUpsertBatch testing
  * pattern): live snapshot ≡ one-shot census, crash replay, cross-
  * batch duplicate delivery, and the base+delta compaction bound. */
class GraphStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val allEdges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
    5L -> 3L, 5L -> 6L, 6L -> 7L, 7L -> 5L, 1L -> 7L, 2L -> 7L, 1L -> 4L)

  def censusOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).sortBy(_._1).toSeq

  def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graphstream").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  def oneShot: Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    censusOf(Graph.triangleCensus(allEdges.toDF("u", "v")))
  }

  test("snapshot after N batches equals the one-shot census") {
    import spark.implicits._
    val dir = freshDir()
    allEdges.grouped(4).zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyGraphCensusBatch(b.toDF("u", "v"), i, dir)
    }
    val snap = StreamingPipeline.graphCensusSnapshot(spark, dir)
    assert(snap.isDefined)
    assert(censusOf(snap.get) == oneShot)
  }

  test("crash replay of a committed batch is a no-op") {
    import spark.implicits._
    val dir = freshDir()
    val batches = allEdges.grouped(4).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyGraphCensusBatch(b.toDF("u", "v"), i, dir)
    }
    // replay every batch (restart-from-checkpoint semantics)
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyGraphCensusBatch(b.toDF("u", "v"), i, dir)
    }
    assert(censusOf(StreamingPipeline.graphCensusSnapshot(spark, dir).get)
      == oneShot)
  }

  test("cross-batch duplicate edges do not double-count") {
    import spark.implicits._
    val dir = freshDir()
    val b0 = allEdges.take(6)
    val b1 = allEdges // re-delivers all of b0 plus the rest
    StreamingPipeline.applyGraphCensusBatch(b0.toDF("u", "v"), 0, dir)
    StreamingPipeline.applyGraphCensusBatch(b1.toDF("u", "v"), 1, dir)
    assert(censusOf(StreamingPipeline.graphCensusSnapshot(spark, dir).get)
      == oneShot)
  }

  test("live PageRank snapshot equals the one-shot solve") {
    import spark.implicits._
    val dir = freshDir()
    allEdges.grouped(5).zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyGraphCensusBatch(b.toDF("u", "v"), i, dir)
    }
    val snap = StreamingPipeline.graphPageRankSnapshot(spark, dir, iters = 6)
    assert(snap.isDefined)
    val sym = (allEdges ++ allEdges.map(_.swap)).toDF("src", "dst")
    val oneShotPr = graft.datapipe.PageRank.pageRankFixed(sym, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = snap.get.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == oneShotPr)
    // empty state dir answers None, not an exception
    assert(StreamingPipeline.graphPageRankSnapshot(spark, freshDir()).isEmpty)
  }

  test("live coreness snapshot equals the batch face") {
    import spark.implicits._
    val dir = freshDir()
    allEdges.grouped(5).zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyGraphCensusBatch(b.toDF("u", "v"), i, dir)
    }
    val snap = StreamingPipeline.graphCorenessSnapshot(spark, dir, rounds = 8)
    assert(snap.isDefined)
    val oneShotCore = Graph.coreness(allEdges.toDF("u", "v"), 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val got = snap.get.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == oneShotCore)
    assert(got.values.forall(_._3), "snapshot must be converged")
    assert(StreamingPipeline.graphCorenessSnapshot(spark, freshDir()).isEmpty)
  }

  test("compaction folds deltas and bounds the file count") {
    import spark.implicits._
    val dir = freshDir()
    val batches = allEdges.grouped(2).toSeq // 6 batches, compactEvery=2
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyGraphCensusBatch(b.toDF("u", "v"), i, dir,
        compactEvery = 2)
    }
    assert(censusOf(StreamingPipeline.graphCensusSnapshot(spark, dir).get)
      == oneShot)
    // bases exist and absorbed deltas are gone: at most compactEvery-1
    // delta partitions remain per relation
    for (rel <- Seq("edges_delta", "census_delta")) {
      val d = new java.io.File(s"$dir/$rel")
      val parts = Option(d.list()).map(_.count(_.startsWith("batch_id=")))
        .getOrElse(0)
      assert(parts <= 1, s"$rel has $parts delta partitions")
    }
    assert(new java.io.File(s"$dir/edges_base/_LATEST").exists())
    assert(new java.io.File(s"$dir/census_base/_LATEST").exists())
  }
}
