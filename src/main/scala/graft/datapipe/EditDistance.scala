package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) near-match pairs with exact blocking —
  * the string-level member of the dedup family (complements shingle
  * Jaccard and embedding cosine for short fields: names, titles,
  * identifiers).
  *
  * Blocking strategy: an application-level equi-block (e.g. same
  * brand / same source) turns the quadratic all-pairs problem into an
  * equi-JOIN — a plain shuffled hash join, no cross product at the
  * table level — and a length-band predicate
  * `|len(a) - len(b)| <= maxDist` prunes in-block pairs WITHOUT
  * losing any: an edit script of length d changes string length by at
  * most d, so the band is exactness-preserving. The `levenshtein`
  * filter itself is Spark's codegen'd built-in with the `threshold`
  * fast-path overload (bails out of the DP once the distance provably
  * exceeds the bound — O(maxDist·n) instead of O(n²) per pair).
  *
  * At 100 TB: block keys with heavy skew (one brand = half the data)
  * are the risk — the block column should be chosen so blocks stay
  * bounded; AQE skew-join splitting handles residual imbalance since
  * this is an ordinary shuffle join.
  */
object EditDistance {

  /** Pairs (id_a, id_b, dist) within the same `blockCol` whose
    * `strCol` values are within `maxDist` edits. id_a < id_b. */
  def nearMatchPairs(df: DataFrame, idCol: String, strCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    // The per-PAIR Levenshtein runs in the probe-side tasks; a
    // single-split input would serialize it (Par.ensure is a no-op on
    // inputs that already scan with real parallelism).
    val a = graft.util.Par.ensure(
      df.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
        col(blockCol).as("blk")))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
      col(blockCol).as("blk"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // threshold overload returns -1 past the bound
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
