package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles by radix selection — the k-th order
  * statistic of a long column without sorting anything: 8 rounds of
  * 256-bin byte histograms (each a partial-aggregated `groupBy` whose
  * exchange carries ≤ 256 rows per partition), walking one byte of
  * the answer per round from the most significant down. Total driver
  * state: 256 counts per round.
  *
  * Why not sort-and-offset: a global sort range-shuffles the whole
  * column to find ONE element. Why not `percentile_approx`/t-digest:
  * approximate, engine-specific merge order. This is exact and every
  * pass is a scan + tiny agg; the q71 sampled-quantile op remains the
  * single-pass approximate path.
  *
  * Signed longs order correctly after XOR-ing the sign bit (flipped
  * space is unsigned-ascending); the walk happens in flipped space
  * and un-flips at the end.
  */
object Quantiles {

  /** Exact k-th smallest (1-based) value of `valueCol` (cast to long,
    * nulls excluded). `k` must be in [1, count]. The input is cached
    * for the 8 passes and unpersisted after — at cluster scale use a
    * persisted single-column projection the same way. */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long): Long = {
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("f", col("v").bitwiseXOR(lit(Long.MinValue)))
      .cache()
    try {
      var hi = 0L // flipped-space answer bytes fixed so far
      var rem = k
      var b = 7
      while (b >= 0) {
        val shift = 8 * b
        val scoped = if (b == 7) vals
          else vals.filter(shiftrightunsigned(col("f"), shift + 8) === lit(hi))
        val hist = scoped
          .groupBy(shiftrightunsigned(col("f"), shift)
            .bitwiseAND(lit(255L)).as("b"))
          .count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        var bucket = 0L
        var cum = 0L
        var found = false
        while (!found && bucket <= 255L) {
          val n = hist.getOrElse(bucket, 0L)
          if (cum + n >= rem) { rem -= cum; found = true }
          else { cum += n; bucket += 1 }
        }
        require(found, s"k=$k exceeds the non-null count")
        hi = (hi << 8) | bucket
        b -= 1
      }
      hi ^ Long.MinValue
    } finally vals.unpersist()
  }

  /** Exact quantiles of `valueCol` at ranks k = ceil(q·n), one row
    * per (label, q): (q, k, value). */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    val rows = qs.map { case (label, q) =>
      val k = math.max(1L, math.ceil(q * n).toLong)
      (label, k, kthSmallest(vals, "v", k))
    }
    rows.toDF("q", "k", valueCol)
  }
}
