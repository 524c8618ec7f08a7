package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: snap an irregular event stream onto a
  * regular per-key time grid with gap rows, and forward-fill the last
  * observation across gaps — the feature-engineering shape for
  * "state of each user/sensor at every hour".
  *
  * Execution: one aggregation for the per-(key, bucket) last
  * observation (deterministic: latest (ts, tiebreak)), one tiny
  * aggregation for per-key spans, a `sequence()` explode for the grid
  * (rows ∝ span/step per key, generated — not shuffled), an equi-join
  * grid⋈buckets on (key, bucket), and a forward-fill window
  * (`last(ignoreNulls)` over the grid order). Everything partitions by
  * the key; no global stage. Keys with multi-year spans × tiny steps
  * are the blow-up to watch: the grid is rows-per-key ≈ span/step, so
  * bound the step or the span upstream. */
object Resample {

  /** Parse an interval-literal-style step ("15 minutes", "1 hour",
    * "2 days") to its width in seconds. Restricted to fixed-width units
    * — months/years are variable-width and cannot define an epoch-
    * aligned grid. */
  private[datapipe] def stepSeconds(step: String): Long = {
    val Pat = raw"(?i)\s*(\d+)\s*(second|minute|hour|day|week)s?\s*".r
    step match {
      case Pat(n, unit) =>
        val w = unit.toLowerCase match {
          case "second" => 1L
          case "minute" => 60L
          case "hour"   => 3600L
          case "day"    => 86400L
          case "week"   => 604800L
        }
        n.toLong * w
      case _ => throw new IllegalArgumentException(
        s"unsupported resample step '$step' (want e.g. '15 minutes', '1 hour')")
    }
  }

  /** Hourly (or any `step`) grid per `keyCol` from each key's first to
    * last event bucket; `n_events` counts events in the bucket (0 for
    * gaps) and `ffill_value` carries the last observed `valueCol`
    * forward. `tieCol` breaks equal-timestamp ties deterministically.
    *
    * Buckets are aligned to Unix-epoch multiples of `step` (for "1
    * hour" in a UTC session this is exactly `date_trunc('hour')`; for
    * sub-hour steps it floors to the step width within the hour). The
    * input timestamp type (TIMESTAMP or TIMESTAMP_NTZ) is preserved in
    * `bucket_ts`. */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, step: String = "1 hour"): DataFrame = {
    val stepSec = stepSeconds(step)
    val tsType = events.schema(tsCol).dataType
    // NTZ won't cast straight to long in Spark 4 — hop through timestamp
    // (identity under the UTC session tz all graft entry points set).
    def bucketOf(c: Column): Column = {
      val e = c.cast("timestamp").cast("long")
      timestamp_seconds(e - pmod(e, lit(stepSec))).cast(tsType)
    }
    val bucket = bucketOf(col(tsCol))
    val ranked = events
      .withColumn("__bucket", bucket)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__bucket"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
    val hourly = ranked.groupBy(col(keyCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"),
        max(when(col("__rn") === 1, col(valueCol))).as("__last"))
    val grid = events.groupBy(col(keyCol))
      .agg(bucketOf(min(col(tsCol))).as("__lo"),
        bucketOf(max(col(tsCol))).as("__hi"))
      .select(col(keyCol),
        explode(expr(s"sequence(__lo, __hi, interval $step)")).as("__bucket"))
    grid.join(hourly, Seq(keyCol, "__bucket"), "left_outer")
      .select(col(keyCol), col("__bucket").as("bucket_ts"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__last"), ignoreNulls = true).over(
          Window.partitionBy(col(keyCol)).orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("ffill_value"))
  }
}
