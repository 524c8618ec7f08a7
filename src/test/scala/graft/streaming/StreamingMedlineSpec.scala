package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.{MedlineGen, MedlineParser, MedlineSource}

/** Incremental MEDLINE as a file stream: drop baseline then update
  * files into a watched directory; the stateful latest-version stream
  * revises and tombstones continuously. */
class StreamingMedlineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("file-stream source + stateful dedup over arriving updatefiles") {
    val dir = java.nio.file.Files.createTempDirectory("medline_stream").toString

    val frags = MedlineSource.fragmentsStream(spark, s"$dir/*.xml.gz")
    val parsed = MedlineParser.parse(spark, frags)
    val latest = StreamingPipeline.latestVersionStream(spark, parsed)
    val query = latest.writeStream
      .format("memory").queryName("stream_pubs")
      .outputMode("append").start()

    // drop the baseline file (100 PMIDs)
    MedlineGen.writeFile(s"$dir/pubmed20n0001.xml.gz",
      (1L to 100L).map(10000000L + _), Nil, seed = 1, version = 1)
    query.processAllAvailable()
    val afterBaseline = spark.table("stream_pubs").count()
    assert(afterBaseline == 100)

    // drop an update: revise 10, delete 2 others
    MedlineGen.writeFile(s"$dir/pubmed20n0900.xml.gz",
      (1L to 10L).map(10000000L + _), Seq(10000000L + 11, 10000000L + 12),
      seed = 2, version = 2)
    query.processAllAvailable()
    val rows = spark.table("stream_pubs")
    // 100 baseline emissions + 10 revision emissions (tombstones emit nothing)
    assert(rows.count() == 110)
    import org.apache.spark.sql.functions._
    val v2 = rows.filter(col("title").contains("(v2)")).count()
    assert(v2 == 10)
    query.stop()
  }

  test("checkpoint recovery: restart resumes state, no reprocessing, no downgrade") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("medline_ckpt").toString
    val ckpt = s"$dir/checkpoint"

    // memory sink cannot recover from a checkpoint; the parquet file
    // sink can (its own commit log dedups batches across restarts)
    def startQuery() = {
      val frags = MedlineSource.fragmentsStream(spark, s"$dir/in/*.xml.gz")
      val parsed = MedlineParser.parse(spark, frags)
      StreamingPipeline.latestVersionStream(spark, parsed)
        .select(col("pub_id"), col("title"), col("filename"))
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def sink() = spark.read.parquet(s"$dir/out")

    new java.io.File(s"$dir/in").mkdirs()
    val q1 = startQuery()
    MedlineGen.writeFile(s"$dir/in/pubmed20n0001.xml.gz",
      (1L to 50L).map(20000000L + _), Nil, seed = 1, version = 2)
    q1.processAllAvailable()
    assert(sink().count() == 50)
    q1.stop() // simulated crash/stop after the first batch committed

    // while down: an update file arrives — revises 5, plus a STALE v1
    // for pmid 1 that the recovered state must reject
    MedlineGen.writeFile(s"$dir/in/pubmed20n0900.xml.gz",
      (2L to 6L).map(20000000L + _), Nil, seed = 2, version = 3)
    MedlineGen.writeFile(s"$dir/in/pubmed20n0000.xml.gz",
      Seq(20000000L + 1), Nil, seed = 3, version = 1)

    // restart from the SAME checkpoint: the file-source log knows the
    // baseline was consumed; the state store still holds per-PMID state
    val q2 = startQuery()
    q2.processAllAvailable()
    val out = sink()
    // ONLY the new work is emitted: 50 prior rows + 5 revisions (the
    // stale v1 suppressed by recovered state, baseline not reprocessed)
    assert(out.count() == 55, out.collect().mkString(","))
    assert(out.filter(col("title").contains("(v3)")).count() == 5)
    assert(out.filter(col("title").contains("(v1)")).count() == 0)
    q2.stop()
  }
}
