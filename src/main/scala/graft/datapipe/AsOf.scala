package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (builder brief: "an operator Spark lacks — as-of join").
  *
  * For each left row, attach the latest right row with
  * `right.ts <= left.ts` (or `<` when strict) sharing the same key.
  *
  * Implemented union-side, not as a range self-join: both inputs are
  * tagged and unioned, ONE shuffle partitions by key, and a
  * last(..., ignoreNulls) window over the time-ordered stream carries
  * the most recent right-side values forward into left rows. A range
  * join would shuffle both sides AND explode candidate pairs before
  * filtering to the max — this shape is one exchange and linear output,
  * which is what survives a 100 TB fact table.
  *
  * Tie discipline: at equal ts, the right row is visible to the left
  * row when inclusive (`strict = false`), hidden when strict. Within
  * the right side, later rows in (ts, tieCol) order win — tieCol must
  * make the ordering total for deterministic results.
  */
object AsOf {

  /** @param valueCols right-side columns to carry; emitted as
    *                  `asof_<name>` on matched left rows (null when no
    *                  prior right row exists). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // side 1 = right; at equal ts the right row sorts first (inclusive)
    // or last (strict), controlled by sortSide
    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol), col(tieCol).as("__tie"), lit(1).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    val taggedLeft = left.select(
      (leftCols.map(col).toSeq ++ Seq(col(tieCol).as("__tie"), lit(0).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val combined = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // ordering: ts, then side (right first when inclusive), then tie
    val sideOrder: Column = if (strict) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, sideOrder, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withVals = valueCols.foldLeft(combined) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("__side") === 1, col(s"__v_$c")), ignoreNulls = true).over(w))
    }
    withVals
      .filter(col("__side") === 0)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))).toIndexedSeq: _*)
  }
}
