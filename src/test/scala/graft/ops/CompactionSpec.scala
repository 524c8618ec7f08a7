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

  test("z-ordered compaction: 2-D box query touches fewer files than row order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 64x64 grid in random-ish (id-hash) order
    val grid = (0 until 4096).map { i =>
      val x = (i * 2654435761L % 4096).toInt
      (x % 64, x / 64, i.toLong)
    }.toDF("x", "y", "payload")
    grid.repartition(1).write.mode("overwrite").parquet(s"$dir/roworder")
    Compaction.writeZOrdered(grid, s"$dir/zorder", targetRows = 256, "x", "y")
    assert(parquetFiles(s"$dir/zorder").length == 16)
    // content preserved
    assert(spark.read.parquet(s"$dir/zorder").count() == 4096)

    // z-order clusters 2-D locality: an 8x8 box (1/64 of the space)
    // must concentrate in a small fraction of the 16 files
    val touched = spark.read.parquet(s"$dir/zorder")
      .filter(col("x").between(8, 15) && col("y").between(8, 15))
      .select(input_file_name()).distinct().count()
    assert(touched <= 4, s"box query touched $touched of 16 z-ordered files")

    // per-file bounding boxes are tight on BOTH axes: no file spans
    // the full extent of both dimensions (a random layout does)
    val boxes = spark.read.parquet(s"$dir/zorder")
      .groupBy(input_file_name())
      .agg(max("x") - min("x"), max("y") - min("y"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(boxes.forall { case (dx, dy) => dx < 64 || dy < 64 }, boxes.toSeq)
    assert(boxes.count { case (dx, dy) => dx <= 31 && dy <= 31 } >= 8, boxes.toSeq)
  }

  test("z-value interleave orders 2-D neighbors together") {
    import graft.functions.ZOrder2Expr.interleave
    // quadrant structure: all of quadrant (low x, low y) sorts before
    // the (high, high) quadrant
    assert(interleave(0, 0) < interleave(0, 1))
    assert(interleave(3, 3) < interleave(4, 0)) // 2-bit block boundary
    assert(interleave(63, 63) < interleave(64, 64))
    // signed order respected on both axes and the output
    assert(interleave(-1, 0) < interleave(0, 0))
    assert(interleave(Int.MinValue, Int.MinValue) < interleave(0, 0))
    assert(interleave(0, 0) < interleave(Int.MaxValue, Int.MaxValue))
    // bit-exact known value: x=1,y=0 -> bit 1 of the unsigned code
    assert((interleave(1, 0) ^ Long.MinValue) ==
      ((interleave(0, 0) ^ Long.MinValue) | 2L))
  }

  test("z-order write rejects clustering columns wider than 32 bits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zreject").toString
    val wide = Seq((5000000000L, 1), (1L, 2)).toDF("big", "small")
    val e = intercept[IllegalArgumentException] {
      Compaction.writeZOrdered(wide, s"$dir/out", 100, "big", "small")
    }
    assert(e.getMessage.contains("32-bit"), e.getMessage)
  }

  test("fileCount arithmetic") {
    assert(Compaction.fileCount(1000, 250) == 4)
    assert(Compaction.fileCount(1001, 250) == 5)
    assert(Compaction.fileCount(10, 250) == 1)
    assert(Compaction.fileCount(0, 250) == 1)
  }
}
