package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction rewrites many tiny files into the target count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate a fragmented sink: 64 partitions for 1000 rows
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(64).write.mode("overwrite").parquet(s"$dir/tiny")
    assert(parquetFiles(s"$dir/tiny").length == 64)

    val df = spark.read.parquet(s"$dir/tiny")
    Compaction.writeCompacted(df, s"$dir/compact", targetRows = 250)
    assert(parquetFiles(s"$dir/compact").length == 4)
    // content preserved
    assert(spark.read.parquet(s"$dir/compact").count() == 1000)
    assert(spark.read.parquet(s"$dir/compact").agg(sum("id")).head().getLong(0)
      == 1000L * 1001 / 2)
  }

  test("sorted compaction gives non-overlapping per-file key ranges (min/max pruning)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(16).write.mode("overwrite").parquet(s"$dir/tiny")
    Compaction.writeCompacted(spark.read.parquet(s"$dir/tiny"),
      s"$dir/sorted", targetRows = 250, sortCol = Some("id"))

    // per-file min/max must not overlap: a key-range predicate then
    // touches a single file
    val ranges = spark.read.parquet(s"$dir/sorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4, ranges.toSeq)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.toSeq)
      case _ =>
    }
    // and a selective filter reads exactly one file
    val files = spark.read.parquet(s"$dir/sorted").filter(col("id") === 42)
      .select(input_file_name()).distinct().collect()
    assert(files.length == 1)
  }

  test("fileCount arithmetic") {
    assert(Compaction.fileCount(1000, 250) == 4)
    assert(Compaction.fileCount(1001, 250) == 5)
    assert(Compaction.fileCount(10, 250) == 1)
    assert(Compaction.fileCount(0, 250) == 1)
  }
}
