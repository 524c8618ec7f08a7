package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism guard for per-row-CPU-heavy stages: a small local input
  * — one parquet file with a single row group — scans as ONE task
  * (`maxPartitionBytes` cannot split inside a row group), serializing
  * work that is embarrassingly parallel. When the scan yields far fewer
  * partitions than the cluster parallelism, repartition first; at real
  * scale the input already has enough splits and this is a no-op (no
  * added shuffle).
  *
  * Use ONLY where the per-row compute outweighs one shuffle of the
  * input columns — measured at sf0.1: the 128-permutation minhash
  * signature wins (~0.25 s), while the single-pass md5 simhash and
  * winnowing lose (~0.5 s regression) and stay unguarded.
  */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    // Streaming frames pass through untouched: microbatch parallelism
    // is the source's concern, and .rdd is not defined before
    // writeStream.start() — this is what lets a guarded batch operator
    // (e.g. chunkDocuments) run UNCHANGED as its own streaming twin.
    if (df.isStreaming) return df
    val have = df.rdd.getNumPartitions
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (have * 2 < want) df.repartition(want) else df
  }
}
