package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** [[StreamingPipeline.applyAttributionBatch]]: the q179 linear
  * attribution as a state machine. The load-bearing claim is that
  * per-batch per-channel credit partials SUM bit-equal to the
  * one-shot rollup (each purchase is attributed exactly once, against
  * exactly its full in-window touch history), so the strongest tie
  * available is streaming the entire corpus from an empty init and
  * hash-comparing against the batch face — including with
  * compaction + horizon pruning forced every batch.
  */
class AttributionStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def oneShot =
    graft.queries.AnalyticsQueries.attribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def streamAll(stateDir: String, nBatches: Int,
      compactEvery: Int): Unit = {
    val ev = graft.util.Tables.events(spark, sfDir)
      .orderBy(col("ts"), col("event_id")).collect()
    val schema = graft.util.Tables.events(spark, sfDir).schema
    val per = math.ceil(ev.length.toDouble / nBatches).toInt
    ev.grouped(per).zipWithIndex.foreach { case (rows, i) =>
      val batch = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      StreamingPipeline.applyAttributionBatch(batch, i.toLong, stateDir,
        compactEvery)
    }
  }

  test("streaming a whole corpus from empty init == one-shot q179") {
    val sd = java.nio.file.Files.createTempDirectory("attrstream").toString
    assert(StreamingPipeline.attributionSnapshot(spark, sd).isEmpty,
      "None before the first commit")
    streamAll(sd, nBatches = 4, compactEvery = 8)
    val snap = StreamingPipeline.attributionSnapshot(spark, sd)
    assert(snap.isDefined)
    val got = snap.get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == oneShot, "credit partials must sum bit-equal")
  }

  test("replaying a committed batch is a no-op") {
    val sd = java.nio.file.Files.createTempDirectory("attrreplay").toString
    streamAll(sd, nBatches = 3, compactEvery = 8)
    val before = StreamingPipeline.attributionSnapshot(spark, sd)
      .get.collect().toList
    // replay batch 1 with DIFFERENT content: the marker gate must win
    val fake = graft.util.Tables.events(spark, sfDir).limit(5)
    StreamingPipeline.applyAttributionBatch(fake, 1L, sd, 8)
    val after = StreamingPipeline.attributionSnapshot(spark, sd)
      .get.collect().toList
    assert(after == before)
  }

  test("streaming stickiness snapshot == one-shot q184") {
    val sd = java.nio.file.Files.createTempDirectory("stickstream").toString
    assert(StreamingPipeline.stickinessSnapshot(spark, sd).isEmpty)
    val ev = graft.util.Tables.events(spark, sfDir)
      .orderBy(col("ts"), col("event_id")).collect()
    val schema = graft.util.Tables.events(spark, sfDir).schema
    // overlapping batches on purpose: the same user-day lands twice
    // and the cross-batch distinct must absorb it
    val per = math.ceil(ev.length / 3.0).toInt
    Seq(ev.slice(0, per + 20), ev.slice(per, 2 * per + 20),
      ev.slice(2 * per, ev.length)).zipWithIndex.foreach { case (rows, i) =>
      StreamingPipeline.applyStickinessBatch(
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema),
        i.toLong, sd)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(rows(StreamingPipeline.stickinessSnapshot(spark, sd).get) ==
      rows(graft.queries.AnalyticsQueries.stickiness(spark, sfDir)))
  }

  test("streaming CUSUM snapshot == one-shot q193 (hour-splitting batches)") {
    val sd = java.nio.file.Files.createTempDirectory("cusumstream").toString
    assert(StreamingPipeline.cusumSnapshot(spark, sd).isEmpty)
    val ev = graft.util.Tables.events(spark, sfDir)
      .orderBy(col("ts"), col("event_id")).collect()
    val schema = graft.util.Tables.events(spark, sfDir).schema
    // batch boundaries NOT hour-aligned: the snapshot's delta-sum must
    // merge the split hours back together
    val per = ev.length / 4 + 3
    ev.grouped(per).zipWithIndex.foreach { case (rows, i) =>
      StreamingPipeline.applyCusumBatch(
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema),
        i.toLong, sd)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 7).map(r.get).toList).toList
    assert(rows(StreamingPipeline.cusumSnapshot(spark, sd).get) ==
      rows(graft.queries.AnalyticsQueries.cusumShift(spark, sfDir)))
  }

  test("streaming trending snapshot == one-shot q206 (day-splitting batches)") {
    val sd = java.nio.file.Files.createTempDirectory("trendstream").toString
    assert(StreamingPipeline.trendingSnapshot(spark, sd).isEmpty)
    val ev = graft.util.Tables.events(spark, sfDir)
      .orderBy(col("ts"), col("event_id")).collect()
    val schema = graft.util.Tables.events(spark, sfDir).schema
    val per = ev.length / 3 + 7 // boundaries not day-aligned
    ev.grouped(per).zipWithIndex.foreach { case (rows, i) =>
      StreamingPipeline.applyTrendingBatch(
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema),
        i.toLong, sd)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 7).map(r.get).toList).toList
    assert(rows(StreamingPipeline.trendingSnapshot(spark, sd).get) ==
      rows(graft.queries.AnalyticsQueries.trendingTerms(spark, sfDir)))
  }

  test("per-batch compaction + horizon pruning preserves the rollup") {
    val sd = java.nio.file.Files.createTempDirectory("attrcompact").toString
    streamAll(sd, nBatches = 5, compactEvery = 1)
    val got = StreamingPipeline.attributionSnapshot(spark, sd)
      .get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == oneShot,
      "pruned touches are exactly those no future purchase can credit")
    // compaction keeps the delta dir bounded: absorbed partitions GC'd
    val deltas = new java.io.File(s"$sd/touch").listFiles()
    assert(deltas == null || deltas.count(_.getName.startsWith("batch_id=")) <= 1,
      "per-batch compaction leaves at most the newest delta")
  }
}
