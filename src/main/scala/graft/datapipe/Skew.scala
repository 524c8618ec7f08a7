package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder brief: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime
  * (enabled in every session here); explicit salting is still needed
  * when (a) the skewed side feeds a *broadcast*-ineligible join with a
  * hot key so large one task can't hold it, or (b) a `collect_list`/
  * window over a hot key needs to be split. These helpers implement the
  * classic replicate-small-side/salt-big-side pattern.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `nSalts` buckets and replicating the small side once per bucket.
    * Semantically identical to `big.join(small, key)`; the shuffle key
    * becomes (key, salt) so one hot key spreads over nSalts tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int = 16): DataFrame = {
    require(nSalts > 0)
    // deterministic salt: hash of the whole row spreads a hot key's rows
    // uniformly without an RNG (stable across retries — important for
    // speculative execution)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
    val smallReplicated = small
      .withColumn("__salt", explode(array((0 until nSalts).map(lit): _*)))
    bigSalted
      .join(smallReplicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation for hot grouping keys: first aggregate on
    * (key, salt), then merge the partials on key. For algebraic
    * aggregates Spark's own partial aggregation already does this; use
    * this form for `collect_list`-like holistic aggregates where one
    * hot key would otherwise overwhelm a single task.
    *
    * `partial` aggregates a salted group; `merge` combines partials.
    */
  def saltedAgg(df: DataFrame, key: String, nSalts: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
    val partials = partial(salted.groupBy(col(key), col("__salt")))
    merge(partials.groupBy(col(key)))
  }
}
