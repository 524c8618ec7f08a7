package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles by radix selection — the k-th order
  * statistic of a long column without sorting anything: 8 rounds of
  * 256-bin byte histograms (each a partial-aggregated `groupBy` whose
  * exchange carries ≤ 256·Q rows per partition for Q pending ranks),
  * walking one byte of the answer per round from the most significant
  * down. Total driver state: ≤ 256·Q counts per round.
  *
  * ALL requested ranks share one walk: each round runs a single
  * histogram job grouped by (current-prefix, next-byte), scoped to
  * the ≤ Q distinct prefixes still pending — so p50/p90/p99 cost one
  * cache fill and 8 passes, not one walk per quantile. (A per-rank
  * walk is 3 cache fills + 24 passes for 3 quantiles — pure wasted
  * I/O, since the scan is identical and only the bucket bookkeeping
  * differs.)
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

  /** Exact k-th smallest (1-based) values of `valueCol` (cast to
    * long, nulls excluded) for EVERY k in `ks`, via one shared radix
    * walk: one cache fill, 8 histogram rounds total. Each k must be
    * in [1, count]. The input is cached for the 8 passes and
    * unpersisted after — at cluster scale use a persisted
    * single-column projection the same way. */
  def kthSmallestBatch(df: DataFrame, valueCol: String,
                       ks: Seq[Long]): Map[Long, Long] = {
    require(ks.nonEmpty, "at least one rank required")
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("f", col("v").bitwiseXOR(lit(Long.MinValue)))
      .cache()
    try {
      // Bound the walk: one (min, max) pass over the cached relation
      // fixes every byte above the highest DIFFERING byte for free —
      // all rows share that prefix, so those rounds' histograms would
      // be single-bucket scans (for non-negative data, flipped-space
      // bytes 7..4 are constant 0x80,0,0,0 and half the 8 rounds is
      // pure wasted I/O; measured on q85/q208). Identical order
      // statistics — the skipped rounds could only ever choose the
      // shared prefix byte.
      val mm = vals.agg(min(col("f")), max(col("f"))).head()
      if (mm.isNullAt(0)) {
        // no rows at all — preserve the loud per-rank failure below
        require(ks.isEmpty, s"k=${ks.head} exceeds the non-null count")
      }
      val (fMin, fMax) = (mm.getLong(0), mm.getLong(1))
      val diff = fMin ^ fMax
      val b0 =
        if (diff == 0L) -1 // all values equal — answer is fMin
        else (63 - java.lang.Long.numberOfLeadingZeros(diff)) / 8
      val sharedPrefix = if (b0 >= 7) 0L else fMin >>> (8 * (b0 + 1))
      if (b0 < 0) {
        // degenerate all-equal relation: the walk is skipped, so the
        // loud out-of-range contract needs its own count check
        val n = vals.count()
        ks.foreach(k => require(k >= 1 && k <= n,
          s"k=$k exceeds the non-null count"))
      }
      // Per pending rank: (hi = flipped-space answer bytes fixed so
      // far, rem = rank within the rows matching that prefix).
      var state = ks.distinct.map(k =>
        k -> ((if (b0 < 0) fMin else sharedPrefix, k))).toMap
      var b = b0
      while (b >= 0) {
        val shift = 8 * b
        // One job for every pending rank: histogram keyed by
        // (prefix-so-far, next byte), scanning only rows whose prefix
        // is still in play. (b == 7 has no prefix: f >>> 64 is a
        // no-op shift in the JVM, so key prefix 0 explicitly.)
        val prefixes = state.values.map(_._1).toSeq.distinct
        val scoped =
          if (b == 7) vals
          else vals.filter(shiftrightunsigned(col("f"), shift + 8)
            .isin(prefixes: _*))
        val prefixKey =
          if (b == 7) lit(0L)
          else shiftrightunsigned(col("f"), shift + 8)
        val hist = scoped
          .groupBy(prefixKey.as("p"),
            shiftrightunsigned(col("f"), shift)
              .bitwiseAND(lit(255L)).as("b"))
          .count().collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        state = state.map { case (k, (hi, rem)) =>
          val p = if (b == 7) 0L else hi
          var bucket = 0L
          var cum = 0L
          var r2 = rem
          var found = false
          while (!found && bucket <= 255L) {
            val n = hist.getOrElse((p, bucket), 0L)
            if (cum + n >= r2) { r2 -= cum; found = true }
            else { cum += n; bucket += 1 }
          }
          require(found, s"k=$k exceeds the non-null count")
          k -> (((hi << 8) | bucket, r2))
        }
        b -= 1
      }
      state.map { case (k, (hi, _)) => k -> (hi ^ Long.MinValue) }
    } finally vals.unpersist()
  }

  /** Exact k-th smallest (1-based) value of `valueCol` — the
    * single-rank convenience over [[kthSmallestBatch]]. */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long): Long =
    kthSmallestBatch(df, valueCol, Seq(k))(k)

  /** [[kthSmallestBatch]] over a WEIGHTED value-count relation
    * (`valueCol`, `cntCol`): the k-th smallest of the expanded
    * multiset, without expanding it — each radix round aggregates
    * `sum(cnt)` per (prefix, byte) instead of `count(*)`. This is the
    * read path of the streaming quantile state (value-count deltas
    * merge by addition, so the summary is mergeable and
    * order-insensitive by construction) and of any pre-aggregated
    * histogram: the walk touches the counts relation — dictionary-
    * sized, ∝ distinct values — never the corpus. Rows with
    * non-positive counts are rejected (a merged summary can never go
    * negative; catching it here fails loudly at the read). */
  def kthSmallestCounts(counts: DataFrame, valueCol: String,
                        cntCol: String, ks: Seq[Long]): Map[Long, Long] = {
    require(ks.nonEmpty, "at least one rank required")
    val vals = counts
      .select(col(valueCol).cast("long").as("v"),
        col(cntCol).cast("long").as("c"))
      .filter(col("v").isNotNull)
      .withColumn("f", col("v").bitwiseXOR(lit(Long.MinValue)))
      .cache()
    try {
      // NULL must be rejected too: a NULL cnt passes `c <= 0` (NULL
      // comparison is not true) and sum(c) would then silently skip
      // it — mass vanishing from the walk instead of failing loudly
      require(vals.filter(col("c").isNull || col("c") <= 0L).isEmpty,
        "kthSmallestCounts: null or non-positive count in the summary")
      // Bound the walk by the shared high-byte prefix (see
      // kthSmallestBatch): one (min, max) agg over the cached summary
      // replaces the constant-prefix rounds.
      val mm = vals.agg(min(col("f")), max(col("f"))).head()
      if (mm.isNullAt(0))
        require(ks.isEmpty, s"k=${ks.head} exceeds the summary mass")
      val (fMin, fMax) = (mm.getLong(0), mm.getLong(1))
      val diff = fMin ^ fMax
      val b0 =
        if (diff == 0L) -1
        else (63 - java.lang.Long.numberOfLeadingZeros(diff)) / 8
      val sharedPrefix = if (b0 >= 7) 0L else fMin >>> (8 * (b0 + 1))
      if (b0 < 0) {
        val nRow = vals.agg(sum(col("c"))).head()
        val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
        ks.foreach(k => require(k >= 1 && k <= n,
          s"k=$k exceeds the summary mass"))
      }
      var state = ks.distinct.map(k =>
        k -> ((if (b0 < 0) fMin else sharedPrefix, k))).toMap
      var b = b0
      while (b >= 0) {
        val shift = 8 * b
        val prefixes = state.values.map(_._1).toSeq.distinct
        val scoped =
          if (b == 7) vals
          else vals.filter(shiftrightunsigned(col("f"), shift + 8)
            .isin(prefixes: _*))
        val prefixKey =
          if (b == 7) lit(0L)
          else shiftrightunsigned(col("f"), shift + 8)
        val hist = scoped
          .groupBy(prefixKey.as("p"),
            shiftrightunsigned(col("f"), shift)
              .bitwiseAND(lit(255L)).as("b"))
          .agg(sum(col("c")).as("n")).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        state = state.map { case (k, (hi, rem)) =>
          val p = if (b == 7) 0L else hi
          var bucket = 0L
          var cum = 0L
          var r2 = rem
          var found = false
          while (!found && bucket <= 255L) {
            val n = hist.getOrElse((p, bucket), 0L)
            if (cum + n >= r2) { r2 -= cum; found = true }
            else { cum += n; bucket += 1 }
          }
          require(found, s"k=$k exceeds the summary mass")
          k -> (((hi << 8) | bucket, r2))
        }
        b -= 1
      }
      state.map { case (k, (hi, _)) => k -> (hi ^ Long.MinValue) }
    } finally vals.unpersist()
  }

  /** Exact quantiles from a WEIGHTED value-count summary at ranks
    * k = max(1, ceil(q·n)) with n = Σcnt — one row per (label, q):
    * (q, k, value), the q85 output shape served from dictionary-sized
    * state. */
  def quantilesFromCounts(counts: DataFrame, valueCol: String,
                          cntCol: String,
                          qs: Seq[(String, Double)]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val nRow = counts.agg(sum(col(cntCol))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n > 0L, "quantilesFromCounts: empty summary")
    val ks = qs.map { case (_, q) => math.max(1L, math.ceil(q * n).toLong) }
    val byK = kthSmallestCounts(counts, valueCol, cntCol, ks)
    qs.zip(ks).map { case ((label, _), k) => (label, k, byK(k)) }
      .toDF("q", "k", valueCol)
  }

  /** Exact quantiles of `valueCol` at ranks k = ceil(q·n), one row
    * per (label, q): (q, k, value) — all ranks resolved by the one
    * shared walk. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    val ks = qs.map { case (_, q) => math.max(1L, math.ceil(q * n).toLong) }
    val byK = kthSmallestBatch(vals, "v", ks)
    val rows = qs.zip(ks).map { case ((label, _), k) => (label, k, byK(k)) }
    rows.toDF("q", "k", valueCol)
  }
}
