package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible-split
  * primitive for training-data pipelines. `TABLESAMPLE`/`df.sample`
  * are seed- and partitioning-dependent (a repartition changes the
  * sample); hashing the row id is not: the same row lands on the same
  * side of every split on any engine, any partitioning, any day.
  *
  * Mechanics: uniform key = first 8 hex chars of md5(id || salt).
  * Fixed-width hex compares lexicographically == numerically, so a
  * fraction f keeps rows with prefix < hex(f·2³²) — engine-portable
  * (DuckDB computes the identical predicate, q53).
  *
  * Scale notes (100 TB): pure per-row predicates — no shuffle, no
  * state; the stratified variant broadcast-joins a tiny fractions dim.
  */
object Sampling {

  /** 8-hex-digit threshold: fraction of the 2³² keyspace, clamped.
    * fraction >= 1.0 returns "g" — lexicographically above every 8-hex
    * key — so a full-fraction sample (and a band with hi = 1.0) keeps
    * ALL rows, including the ~2⁻³² whose md5 prefix is exactly
    * "ffffffff"; strict '<' against "ffffffff" would drop those and
    * break the "bands partition the corpus" invariant. */
  def hexThreshold(fraction: Double): String = {
    if (fraction >= 1.0) "g"
    else {
      val f = math.max(0.0, fraction)
      val v = math.min((f * 4294967296.0).toLong, 0xffffffffL)
      f"$v%08x"
    }
  }

  /** Uniform hash key in hex for a row id (salt varies the split). */
  def hashKey(id: Column, salt: String = ""): Column =
    substring(md5(concat(id.cast("string"), lit(salt))), 1, 8)

  /** Keep a deterministic `fraction` of rows. */
  def uniform(df: DataFrame, idCol: String, fraction: Double,
              salt: String = ""): DataFrame =
    df.filter(hashKey(col(idCol), salt) < lit(hexThreshold(fraction)))

  /** Keyspace band [lo, hi): non-overlapping bands partition the
    * corpus — train/val/test splits that never leak across sides. */
  def band(df: DataFrame, idCol: String, lo: Double, hi: Double,
           salt: String = ""): DataFrame =
    df.filter(hashKey(col(idCol), salt) >= lit(hexThreshold(lo)) &&
      hashKey(col(idCol), salt) < lit(hexThreshold(hi)))

  /** Stratified sample: per-stratum fractions (the data-mix weighting
    * op — up-/down-weight sources or languages), unlisted strata get
    * `defaultFraction`. The fractions dim is broadcast; the filter
    * stays a per-row predicate. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 fractions: Map[String, Double], defaultFraction: Double,
                 salt: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = fractions.toSeq.map { case (k, f) => (k, hexThreshold(f)) }
      .toDF("__stratum", "__thresh")
    df.join(broadcast(dim), col(strataCol) === col("__stratum"), "left_outer")
      .filter(hashKey(col(idCol), salt) <
        coalesce(col("__thresh"), lit(hexThreshold(defaultFraction))))
      .drop("__stratum", "__thresh")
  }
}
