package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-assembly operators for training-data pipelines: pack
  * documents into fixed token-budget batches ("sequence packing") and
  * schedule a weighted mixture of sources into a deterministic
  * training order.
  *
  * Both are pure window/rank computations — deterministic on any
  * engine and any partitioning PROVIDED the ordering key is unique
  * within its window partition (document ids are; see each method's
  * contract) — and shuffle-once per shard: the window partitions by
  * the shard column, so each shard's packing runs independently in
  * parallel. At 100 TB the shard column (source, language, date
  * bucket) bounds per-task state; there is no global sequential scan.
  */
object Packing {

  /** Greedy OFFSET packing: within each `shardCol` partition,
    * documents ordered by `idCol` fill a contiguous token stream; a
    * document belongs to the batch where its START offset falls
    * (batch_id = floor(cumsum_before / budget)). This is the
    * "concatenate-then-chunk" pretraining layout: a document that
    * straddles a boundary still counts toward the earlier batch, so a
    * batch's token total MAY exceed the budget (the consumer splits at
    * exact token offsets, not document edges). For document-atomic
    * batches that never exceed the budget, use [[packByBudgetStrict]].
    * `idCol` must be a unique key within a shard — the running sum
    * follows its order, and ties would make batch boundaries
    * partition-order dependent. */
  def packByBudget(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("batch_id",
        floor((col("__cum") - col(tokensCol)) / lit(tokenBudget)))
      .drop("__cum")
  }

  /** Budget-RESPECTING packing: documents stay atomic and a batch
    * never exceeds `tokenBudget` unless a single document does (such a
    * document gets a batch of its own). The running "fill level" needs
    * a reset at each batch close, which no window frame expresses —
    * this is a per-shard sequential scan via `flatMapSortedGroups`
    * (each shard is one task; shards run in parallel, so the shard
    * column must bound per-task row counts at scale, same contract as
    * [[packByBudget]]). Output: (shard, id, n_tokens, batch_id). */
  def packByBudgetStrict(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("string"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(idCol).asc) { (shard, rows) =>
        var batch = 0L
        var fill = 0L
        rows.map { case (_, id, n) =>
          if (fill > 0 && fill + n > tokenBudget) { batch += 1; fill = 0L }
          fill += n
          (shard, id, n, batch)
        }
      }
      .toDF(shardCol, idCol, tokensCol, "batch_id")
  }

  /** Deterministic weighted-mixture schedule: each source's rows are
    * ranked by a stable content hash, and row r of source s is placed
    * at virtual position r / weight(s) — a source with weight 2w
    * appears twice as often as one with weight w in any prefix of the
    * schedule (stride scheduling). Output adds `position` (the sort
    * key) and `mix_rank` (the global order). Rows of unlisted sources
    * get `defaultWeight`.
    *
    * Scale note: the per-source rank is a partitioned window (one
    * shuffle), but `mix_rank` is a GLOBAL row_number — a single-task
    * sort. That is fine for bounded schedules (the query surface takes
    * a prefix); to materialize a full 100 TB training order, drop
    * `mix_rank` and range-partition-write by `position` instead — the
    * global order is then the file order with no single-task stage
    * (`position` alone determines it). */
  def mixtureSchedule(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    require(defaultWeight > 0 && weights.values.forall(_ > 0),
      s"mixture weights must be positive (zero would schedule a source at " +
        s"position Infinity — i.e. never; negative would invert its order): " +
        s"$weights default=$defaultWeight")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = weights.toSeq.toDF("__src", "__w")
    val ranked = df
      .join(broadcast(dim), col(sourceCol) === col("__src"), "left_outer")
      .withColumn("__weight", coalesce(col("__w"), lit(defaultWeight)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(Sampling.hashKey(col(idCol)), col(idCol))))
      .withColumn("position", col("__r").cast("double") / col("__weight"))
    ranked
      .withColumn("mix_rank", row_number().over(
        Window.orderBy(col("position"), col(sourceCol), col(idCol))).cast("long"))
      .drop("__src", "__w", "__weight", "__r")
  }
}
