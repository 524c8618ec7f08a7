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

  /** Repartition so each task (= output file) holds ~targetRows.
    * NOTE: sizing needs the row count — one extra action over `df`.
    * Cheap on a parquet scan (metadata count); for an expensive
    * upstream DAG, persist `df` first or pass a known count to the
    * writers below. */
  def compactedTo(df: DataFrame, targetRows: Long,
      knownRows: Option[Long] = None): DataFrame =
    df.repartition(fileCount(knownRows.getOrElse(df.count()), targetRows))

  /** Write `df` as ~rows/targetRows parquet files. With `sortCol`,
    * files are range-partitioned and sorted so each covers a narrow,
    * non-overlapping key range (file-level min/max pruning). */
  def writeCompacted(df: DataFrame, path: String, targetRows: Long,
      sortCol: Option[String] = None,
      knownRows: Option[Long] = None): Unit = {
    val shaped = sortCol match {
      case Some(c) =>
        val n = fileCount(knownRows.getOrElse(df.count()), targetRows)
        df.repartitionByRange(n, col(c)).sortWithinPartitions(col(c))
      case None => compactedTo(df, targetRows, knownRows)
    }
    shaped.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-ordered compaction over TWO int clustering columns: cluster by
    * the Morton code ([[graft.functions.ZOrder2Expr]], codegen'd) so
    * every file covers a tight range in BOTH dimensions — a 2-D box
    * predicate prunes files on either axis, where a single-column sort
    * only prunes on its leading column.
    *
    * The sizing pass doubles as a guard: both clustering columns must
    * fit in 32 bits (a silent cast would wrap 64-bit ids and z-order
    * garbage); out-of-range columns need a caller-chosen reduction
    * (e.g. bucket numbers) first. */
  def writeZOrdered(df: DataFrame, path: String, targetRows: Long,
      colA: String, colB: String): Unit = {
    val stats = df.agg(
      count(lit(1)),
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val n = fileCount(stats.getLong(0), targetRows)
    for ((c, lo, hi) <- Seq((colA, 1, 2), (colB, 3, 4))) {
      if (!stats.isNullAt(lo)) {
        require(stats.getLong(lo) >= Int.MinValue && stats.getLong(hi) <= Int.MaxValue,
          s"z-order column $c exceeds 32-bit range " +
            s"[${stats.getLong(lo)}, ${stats.getLong(hi)}]; reduce it first")
      }
    }
    df.withColumn("__z",
        graft.functions.Expressions.zorder2(
          col(colA).cast("int"), col(colB).cast("int")))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
