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

  /** Split ASSIGNMENT (vs [[band]]'s split FILTER): label every row
    * with the name of the keyspace band it falls in, in one scan —
    * the train/val/test manifest op. `cuts` are (name, cumulative
    * upper fraction) with the last hi covering 1.0; bands are
    * [prev, hi) over the same hash keyspace as [[band]], so
    * `assignSplit(df, id, cuts)(split = "train")` ==
    * `band(df, id, 0, 0.8)` row-for-row. Per-row `when` chain over one
    * md5 — no shuffle, no join, nothing to skew at any scale. */
  def assignSplit(df: DataFrame, idCol: String,
                  cuts: Seq[(String, Double)], salt: String = "",
                  splitCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 >= 1.0,
      "cuts must be cumulative fractions ending at 1.0")
    // the when-chain takes the FIRST matching band: unsorted cuts
    // would silently shadow later bands, so reject them
    require(cuts.map(_._2).sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing cumulative fractions: $cuts")
    val key = hashKey(col(idCol), salt)
    val assigned = cuts.init.foldLeft(lit(null).cast("string")) {
      case (acc, (name, hi)) =>
        coalesce(acc, when(key < lit(hexThreshold(hi)), name))
    }
    df.withColumn(splitCol, coalesce(assigned, lit(cuts.last._1)))
  }

  /** Weighted sampling WITHOUT replacement as a top-k: Efraimidis–
    * Spirakis A-ES keys. u = (h + ½)/2³² from the row's [[hashKey]]
    * (uniform in (0,1), deterministic, engine-portable), priority =
    * ln(u)/w — the k largest priorities are a weighted sample where
    * P[selected] scales with w (exactly the u^(1/w) order, log'd).
    * Plans as TakeOrderedAndProject: each partition keeps a local
    * k-heap and only k rows per partition reach the driver-side
    * merge — no global sort, no shuffle of the corpus. Rows with
    * w <= 0 are excluded (zero weight = never sampled). */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
                   k: Int, salt: String = ""): DataFrame = {
    val u = (conv(hashKey(col(idCol), salt), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__pri", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(k)
      .drop("__pri")
  }

  /** Stratified WEIGHTED sampling: the per-stratum weighted top-k —
    * "k documents per source, drawn ∝ weight" — combining [[weightedTopK]]'s
    * A-ES priorities with the bounded-buffer [[TopK]] aggregator, so
    * no per-stratum window sorts a whole (skewed) stratum on one task:
    * ≤ k pairs per (stratum, partition) cross the one keyed exchange.
    * Output (strataCol, rank, idCol); the float priority is internal
    * only (not emitted — it is selection machinery, not data). */
  def stratifiedWeightedTopK(df: DataFrame, strataCol: String, idCol: String,
                             weightCol: String, k: Int,
                             salt: String = ""): DataFrame = {
    val u = (conv(hashKey(col(idCol), salt), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val scored = df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__pri", log(u) / col(weightCol).cast("double"))
    TopK.topKPerGroupByScore(scored, strataCol, "__pri", idCol, k)
      .drop("__pri")
  }

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

  /** Deterministic EPOCH SHUFFLE + sharding — the training-order op: a
    * reproducible pseudo-random permutation of the corpus, split into
    * `shards` streams with an explicit position in each, so N data
    * loaders can read their shard sequentially (no seek storm) while
    * the global order is hash-random. Vary `salt` per epoch for a
    * fresh permutation ("ep0", "ep1", …) — same engine, same corpus,
    * same salt ⇒ bit-identical order on any partitioning, which is
    * what makes a training run resumable and auditable.
    *
    * shard = hash-int % shards; position = 1-based rank of
    * ([[hashKey]], id) within the shard. NOT a global sort and NOT a
    * per-shard window (shards are few — one task per shard is the q65
    * skew trap): the first 2 hex chars of the key band each shard into
    * 256 sub-ranges; per-(shard, band) counts cumsum into exclusive
    * offsets over ≤ shards·256 AGGREGATE rows, and row data only ever
    * ranks within its (shard, band) — the [[QualityScore.rankNormalize]]
    * banded-prefix-sum shape. Output: (idCol, shard, pos). */
  def epochShuffle(df: DataFrame, idCol: String, shards: Int,
                   salt: String = ""): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(idCol), hashKey(col(idCol), salt).as("__key"))
      .withColumn("shard", pmod(conv(col("__key"), 16, 10).cast("long"),
        lit(shards.toLong)))
      .withColumn("__band", substring(col("__key"), 1, 2))
    val offsets = keyed.groupBy(col("shard").as("__osh"), col("__band").as("__ob"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.partitionBy(col("__osh"))
          .orderBy(col("__ob"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osh"), col("__ob"), col("__off"))
    keyed
      .withColumn("__tie", row_number().over(
        Window.partitionBy(col("shard"), col("__band"))
          .orderBy(col("__key"), col(idCol))))
      .join(broadcast(offsets),
        col("shard") === col("__osh") && col("__band") === col("__ob"))
      .select(col(idCol), col("shard"), (col("__off") + col("__tie")).as("pos"))
  }
}
