package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-files compaction — the sink-side discipline that keeps a
  * 100 TB lake healthy. A pipeline that writes one file per task per
  * micro-batch (the reference's WriteToText sharding, main.py:786-787)
  * accumulates millions of tiny files; every later scan then pays
  * per-file open/list overhead and loses row-group-level pruning.
  *
  * Two composable pieces:
  *  - `compactedTo(df, targetRows)` — repartition so each output file
  *    carries ~targetRows rows. One count job + one round-robin
  *    shuffle; the count is O(scan metadata) on parquet sources.
  *  - `writeCompacted(..., sortCol)` — optionally range-partition +
  *    sort by a clustering column instead, so each file covers a
  *    narrow key range and parquet min/max statistics prune file
  *    reads for key-range predicates (poor man's Z-order for the
  *    1-column case).
  */
object Compaction {

  /** Number of output files for `rows` at `targetRows` per file. */
  def fileCount(rows: Long, targetRows: Long): Int =
    math.max(1L, (rows + targetRows - 1) / targetRows).toInt

  /** Repartition so each task (= output file) holds ~targetRows. */
  def compactedTo(df: DataFrame, targetRows: Long): DataFrame =
    df.repartition(fileCount(df.count(), targetRows))

  /** Write `df` as ~rows/targetRows parquet files. With `sortCol`,
    * files are range-partitioned and sorted so each covers a narrow,
    * non-overlapping key range (file-level min/max pruning). */
  def writeCompacted(df: DataFrame, path: String, targetRows: Long,
      sortCol: Option[String] = None): Unit = {
    val n = fileCount(df.count(), targetRows)
    val shaped = sortCol match {
      case Some(c) =>
        df.repartitionByRange(n, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(n)
    }
    shaped.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-ordered compaction over TWO int clustering columns: cluster by
    * the Morton code ([[graft.functions.ZOrder2Expr]], codegen'd) so
    * every file covers a tight range in BOTH dimensions — a 2-D box
    * predicate prunes files on either axis, where a single-column sort
    * only prunes on its leading column. */
  def writeZOrdered(df: DataFrame, path: String, targetRows: Long,
      colA: String, colB: String): Unit = {
    val n = fileCount(df.count(), targetRows)
    df.withColumn("__z",
        graft.functions.Expressions.zorder2(
          col(colA).cast("int"), col(colB).cast("int")))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
