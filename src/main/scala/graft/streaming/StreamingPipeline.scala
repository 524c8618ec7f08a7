package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Publication

/** Structured Streaming surface (SURVEY §2.10 / §7).
  *
  * The reference is pure batch; its baseline/updatefiles/DeleteCitation
  * mechanism (reference main.py:31-32, 290-305, 761-771) is an
  * *incremental batch* pattern. Here it maps to first-class streaming:
  *
  *  - `latestVersionStream`: `flatMapGroupsWithState` keyed by pub_id
  *    holding the current (filename, is_deleted) winner — arriving
  *    update files revise or tombstone articles continuously, emitting
  *    the new latest version (or nothing while deleted);
  *  - `eventsWindowed`: watermarked tumbling-window aggregation — the
  *    generic streaming agg the events table models.
  *
  * Scale: state is partitioned by pub_id (same key as the batch
  * shuffle); with RocksDB state store this holds the ~30M-article key
  * space comfortably (~100 bytes/key).
  */
object StreamingPipeline {

  /** Per-key state: the winning version so far. */
  final case class VersionState(filename: String, isDeleted: Boolean)

  /** Streaming latest-version-per-PMID with tombstones: emits the new
    * latest publication whenever a newer file revises it; emits nothing
    * when the current winner is a tombstone. */
  def latestVersionStream(spark: SparkSession,
      parsed: Dataset[Publication]): Dataset[Publication] = {
    import spark.implicits._
    parsed
      .groupByKey(_.pub_id)
      .flatMapGroupsWithState[VersionState, Publication](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, versions, state: GroupState[VersionState]) =>
          val incoming = versions.toSeq
          val currentBest = state.getOption
          // latest by lexicographic filename (reference main.py:585),
          // tombstones winning filename ties (same determinism rule as
          // the batch Dedup.latestVersion).
          // Strictly-newer check: re-delivery of an already-applied file
          // (source replay after restart) must not re-emit the row.
          val versionOrd = Ordering.Tuple2[String, Boolean]
          val incomingBest = incoming.maxBy(p => (p.filename, p.is_deleted))(versionOrd)
          if (currentBest.forall(c => versionOrd.lt(
              (c.filename, c.isDeleted),
              (incomingBest.filename, incomingBest.is_deleted)))) {
            state.update(VersionState(incomingBest.filename, incomingBest.is_deleted))
            if (incomingBest.is_deleted) Iterator.empty
            else Iterator.single(incomingBest)
          } else Iterator.empty
      }
  }

  /** Streaming exact deduplication of a document stream by content
    * hash: first arrival of each distinct text wins. State is bounded
    * by the event-time watermark (`dropDuplicatesWithinWatermark` —
    * duplicates separated by more than the watermark horizon are not
    * suppressed; combine with a batch [[graft.datapipe.DedupOps]]
    * sweep for full-history dedup, the standard lambda split at 100 TB).
    * The state key is the raw 16-byte md5 (unhex'd binary, not the
    * 32-char hex string), never the document body; the helper column is
    * dropped so the output schema equals the input schema. */
  def dedupStream(docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__text_md5", unhex(md5(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_md5")
      .drop("__text_md5")

  /** Watermarked tumbling-window event aggregation (generic streaming
    * agg; mirrors RelationalQueries.q8EventsHourly as a stream). */
  def eventsWindowed(events: DataFrame,
      watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming sessionization: `session_window` with a dynamic-merge
    * gap — the Structured Streaming twin of the batch
    * [[graft.datapipe.Sessionize]] operator. Sessions close when no
    * event arrives within `gap` (event time) and the watermark passes;
    * state is bounded by the watermark horizon. Output: one row per
    * closed session per user with count and duration. */
  def eventsSessionized(events: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming CDC apply: each micro-batch of keyed upserts/tombstones
    * merges onto the snapshot at `snapshotPath` via
    * [[graft.ops.Merge.applyChanges]] inside `foreachBatch` — the
    * standard Structured-Streaming upsert pattern for sinks without
    * row-level MERGE. The snapshot is read+rewritten per batch
    * (atomically via a temp dir + rename); a transactional table
    * format would replace the rewrite with a real MERGE INTO, the
    * surrounding plumbing is identical. Batches arriving when the
    * snapshot does not yet exist bootstrap it from the delta alone. */
  def upsertStream(delta: DataFrame, snapshotPath: String,
      keyCols: Seq[String], versionCol: String, deletedCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    delta.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val merged =
        if (new java.io.File(snapshotPath).exists()) {
          val base = spark.read.parquet(snapshotPath)
          graft.ops.Merge.applyChanges(base, batch.select(base.columns.map(col): _*),
            keyCols, versionCol, deletedCol)
        } else {
          graft.ops.Merge.applyChanges(
            batch.filter(lit(false)), batch, keyCols, versionCol, deletedCol)
        }
      val tmp = snapshotPath + ".tmp"
      merged.write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(snapshotPath)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      new java.io.File(tmp).renameTo(dir)
      ()
    }

  /** Stream-stream interval join: pair each right-stream event with
    * the left-stream events of the same key that happened in the
    * window (right.ts - horizon, right.ts] — the "attribute a
    * conversion to recent clicks" shape. Both sides are watermarked so
    * the join state is bounded: a buffered left row can be dropped
    * once the right watermark passes its ts + horizon (Spark derives
    * the state-eviction bound from the interval condition; without the
    * time bound the join would buffer both streams forever).
    * Columns: left (key, ts, …lCols), right (key, rts, …rCols). */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      keyCol: String, horizon: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.withColumnRenamed(keyCol, "__rkey")
      .withWatermark("rts", watermark)
    l.join(r,
      col(keyCol) === col("__rkey") &&
        col("ts") > col("rts") - expr(s"INTERVAL $horizon") &&
        col("ts") <= col("rts"),
      "inner").drop("__rkey")
  }
}
