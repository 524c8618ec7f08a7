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
}
