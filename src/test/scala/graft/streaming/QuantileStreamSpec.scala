package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exact quantiles (round-15 closure of the q85 seam): the
  * value-count summary is mergeable by construction, so the live
  * snapshot must be BIT-EQUAL to the one-shot q85 radix walk over the
  * union corpus under any batch split — plus the house crash-window
  * and bounded-state guarantees. */
class QuantileStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
    "p90" -> 0.9, "p95" -> 0.95, "p99" -> 0.99)

  /** deterministic skewed values incl. negatives and duplicates */
  private def vals(lo: Int, hi: Int): Seq[Long] =
    (lo until hi).map { r =>
      val x = (r * 2654435761L) % 10007L
      if (r % 7 == 0) -(x % 977L) else x % (1L + (r % 5).toLong * 3000L)
    }

  private def oneShot(all: Seq[Long]) =
    graft.datapipe.Quantiles.exactQuantiles(
        all.toDF("v"), "v", Qs)
      .orderBy("q").collect().map(_.toSeq).toSeq

  test("streamed snapshot == one-shot q85 walk, bit-equal under non-aligned batches") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("quant_stream").toString
    val state = s"$dir/state"
    val input = MemoryStream[Long]
    val query = StreamingPipeline.quantileStream(
        input.toDF().toDF("v"), state, "v", compactEvery = 2)
      .option("checkpointLocation", s"$dir/ckpt").start()
    assert(StreamingPipeline.quantileSnapshot(spark, state, Qs).isEmpty)
    // three deliberately NON-ALIGNED batches (sizes 113 / 401 / 29)
    val b1 = vals(0, 113)
    val b2 = vals(113, 514)
    val b3 = vals(514, 543)
    input.addData(b1: _*); query.processAllAvailable()
    val mid = StreamingPipeline.quantileSnapshot(spark, state, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(mid == oneShot(b1))
    input.addData(b2: _*); query.processAllAvailable()
    input.addData(b3: _*); query.processAllAvailable()
    query.stop()
    val got = StreamingPipeline.quantileSnapshot(spark, state, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(got == oneShot(b1 ++ b2 ++ b3))
    // and a DIFFERENT split of the same corpus lands on the same state
    val dir2 = java.nio.file.Files.createTempDirectory("quant_stream2").toString
    val state2 = s"$dir2/state"
    val all = b1 ++ b2 ++ b3
    StreamingPipeline.applyQuantileBatch(all.take(7).toDF("v"), 0L, state2, "v")
    StreamingPipeline.applyQuantileBatch(all.drop(7).toDF("v"), 1L, state2, "v")
    val got2 = StreamingPipeline.quantileSnapshot(spark, state2, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(got2 == got)
  }

  test("crash windows: committed-batch replay never double-counts; compaction is invisible to reads") {
    val dir = java.nio.file.Files.createTempDirectory("quant_crash").toString
    val state = s"$dir/state"
    val b0 = vals(0, 50)
    val b1 = vals(50, 90)
    StreamingPipeline.applyQuantileBatch(b0.toDF("v"), 0L, state, "v",
      compactEvery = 2)
    StreamingPipeline.applyQuantileBatch(b1.toDF("v"), 1L, state, "v",
      compactEvery = 2)
    def snap() = StreamingPipeline.quantileSnapshot(spark, state, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq
    val before = snap()
    assert(before == oneShot(b0 ++ b1))
    // flip-then-crash: the checkpoint missed batch 1's commit — the
    // restarted stream re-delivers it; the marker detects and skips
    StreamingPipeline.applyQuantileBatch(b1.toDF("v"), 1L, state, "v",
      compactEvery = 2)
    assert(snap() == before, "replay double-counted a committed batch")
    // compaction ran at batch 2 cadence (compactEvery=2): base exists,
    // absorbed deltas GC'd, reads unchanged
    StreamingPipeline.applyQuantileBatch(vals(90, 95).toDF("v"), 2L, state,
      "v", compactEvery = 2)
    assert(new java.io.File(s"$state/counts_base/_LATEST").exists)
    assert(snap() == oneShot(vals(0, 95)))
  }

  test("storage discipline: bounded base file count, deltas GC'd, reads gated on the commit marker") {
    val dir = java.nio.file.Files.createTempDirectory("quant_files").toString
    val state = s"$dir/state"
    // 10 batches at compactEvery=2: steady-state must not accumulate
    // per-batch files
    (0 until 10).foreach { b =>
      StreamingPipeline.applyQuantileBatch(
        vals(b * 40, b * 40 + 40).toDF("v"), b.toLong, state, "v",
        compactEvery = 2)
    }
    def parquetFiles(p: String): Int = {
      val f = new java.io.File(p)
      if (!f.exists) 0
      else f.listFiles.count(_.getName.endsWith(".parquet"))
    }
    val latest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$state/counts_base/_LATEST"))).trim
    // one compacted base dir with a BOUNDED file count (writeCompacted
    // sizes by rows; this corpus is one file's worth)
    assert(parquetFiles(s"$state/counts_base/$latest") <= 4)
    // absorbed deltas are GC'd: at most the post-base tail remains
    val deltaDirs = Option(new java.io.File(s"$state/delta").listFiles)
      .map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
    assert(deltaDirs <= 2, s"deltas not GC'd: $deltaDirs")
    val before = StreamingPipeline.quantileSnapshot(spark, state, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(before == oneShot(vals(0, 400)))
    // crash window: a delta written BEYOND the committed marker (the
    // crash landed between delta write and marker flip) must be
    // invisible to reads
    vals(400, 440).toDF("v")
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$state/delta/batch_id=11")
    assert(StreamingPipeline.quantileSnapshot(spark, state, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq == before,
      "uncommitted delta leaked into the snapshot")
  }

  test("bounded state: per-batch delta rows == batch distinct values; base stays dictionary-sized") {
    val dir = java.nio.file.Files.createTempDirectory("quant_bound").toString
    val state = s"$dir/state"
    // heavy duplication: 1000 rows over a 10-value support
    val b0 = (0 until 1000).map(r => (r % 10).toLong)
    StreamingPipeline.applyQuantileBatch(b0.toDF("v"), 0L, state, "v",
      compactEvery = 1)
    val base0 = spark.read.parquet(
      s"$state/counts_base/v0")
    assert(base0.count() == 10L) // ∝ support, not ∝ corpus
    assert(base0.agg(sum("cnt")).head().getLong(0) == 1000L)
    // a second batch over the same support adds ZERO state growth
    StreamingPipeline.applyQuantileBatch(b0.toDF("v"), 1L, state, "v",
      compactEvery = 1)
    assert(spark.read.parquet(s"$state/counts_base/v1").count() == 10L)
    val got = StreamingPipeline.quantileSnapshot(spark, state, Qs).get
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(got == oneShot(b0 ++ b0))
  }
}
