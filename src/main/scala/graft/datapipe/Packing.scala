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
  * engine, any partitioning (ordering keys are explicit), and
  * shuffle-once per shard: the window partitions by the shard column,
  * so each shard's packing runs independently in parallel. At 100 TB
  * the shard column (source, language, date bucket) bounds per-task
  * state; there is no global sequential scan.
  */
object Packing {

  /** Greedy contiguous packing: within each `shardCol` partition,
    * documents ordered by `idCol` fill batches of `tokenBudget`; a
    * document belongs to the batch where its start offset falls
    * (batch_id = floor(cumsum_before / budget)). Oversized documents
    * simply span their own batch boundary — downstream truncation
    * policy is the caller's. */
  def packByBudget(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("batch_id",
        floor((col("__cum") - col(tokensCol)) / lit(tokenBudget)))
      .drop("__cum")
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
