package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gaps-and-islands): assign a session id per
  * user, starting a new session whenever the gap to the previous event
  * exceeds `gapSeconds`.
  *
  * Scale notes (100 TB): ONE hash shuffle on the user key; both the lag
  * and the running sum share the same window ordering, so Catalyst
  * evaluates them in a single sort within the exchange — no second
  * shuffle, no self-join. This is the batch twin of Structured
  * Streaming's `session_window` (which covers the streaming case in
  * [[graft.streaming.StreamingPipeline]]).
  *
  * Timestamps compare at whole-second granularity (cast-to-long
  * truncation) so the gap predicate is engine-portable (equal to
  * DuckDB's `date_diff('second', ...)` boundary counting).
  */
object Sessionize {

  /** Whole-second epoch value for either TIMESTAMP or TIMESTAMP_NTZ
    * (NTZ won't cast to BIGINT directly; the TIMESTAMP hop interprets it
    * in the session timezone — UTC in every graft entry point). */
  private def epochSec(c: Column): Column = c.cast("timestamp").cast("long")

  /** Adds a `session_id` column (1-based, per user, in time order).
    * `ordCol` breaks timestamp ties deterministically. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 ordCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(ordCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(w)
    // two projection steps: a window function (lag) can't nest inside
    // another window aggregate (sum) in one expression
    df.withColumn("__is_new",
        when(prevTs.isNull ||
          epochSec(col(tsCol)) - epochSec(prevTs) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__is_new")).over(cum))
      .drop("__is_new")
  }

  /** Per-session summary: event count, first event id, duration in
    * whole seconds. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   ordCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, userCol, tsCol, ordCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(ordCol)).as("first_event_id"),
        (max(epochSec(col(tsCol))) - min(epochSec(col(tsCol))))
          .as("duration_sec"))
}
