package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic keyed batch merge — CDC upsert/delete application. This is
  * the relational generalization of the reference's baseline +
  * updatefiles pattern (reference main.py:761-780: union both file
  * sets, group by pmid, keep the latest version, honor deletion
  * tombstones), reusable for any keyed table: apply a delta batch of
  * upserts and tombstones onto a base snapshot.
  *
  * Execution shape: ONE hash shuffle on the key. The union is free
  * (no shuffle), and `max_by(payload, (version, src))` aggregates with
  * map-side partial aggregation — each partition first reduces to one
  * candidate row per key locally, so the shuffle carries at most one
  * row per (partition × key), not the full delta. This beats the
  * window row_number() formulation (sort within partitions) and the
  * join formulation (two shuffles) and is exactly how
  * [[Dedup.latestVersion]] handles the MEDLINE case.
  *
  * At 100 TB: if the base is bucketed by the key, Catalyst elides the
  * base side's shuffle entirely; deltas are typically small enough
  * that their shuffle is noise. Ties on `versionCol` resolve to the
  * delta row (src ordering), so re-applying the same delta is
  * idempotent.
  */
object Merge {

  /** Apply `delta` onto `base`. Both must share the same columns;
    * `deletedCol` is a boolean (null = false). Returns the merged
    * snapshot: upserted rows present, tombstoned keys absent.
    *
    * `dropTombstones = false` RETAINS the winning tombstone rows
    * instead of filtering them — required when the merge result is
    * itself the base of a later incremental merge: a dropped tombstone
    * could not out-version a late-arriving stale upsert for the same
    * key, silently resurrecting it (filter the deleted flag at read
    * time instead). */
  def applyChanges(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      versionCol: String, deletedCol: String,
      dropTombstones: Boolean = true): DataFrame = {
    val cols = base.columns.toSeq
    require(delta.columns.sorted.sameElements(cols.sorted),
      s"delta columns ${delta.columns.mkString(",")} != base columns ${cols.mkString(",")}")
    require(keyCols.nonEmpty && keyCols.forall(cols.contains))
    val tagged = base.select(cols.map(col): _*).withColumn("__src", lit(0))
      .unionByName(delta.select(cols.map(col): _*).withColumn("__src", lit(1)))
    // ordering: version, then delta-over-base, then a content hash so a
    // delta batch carrying MULTIPLE rows for one key at the same
    // version still resolves deterministically (max_by ties are
    // otherwise arbitrary and would break run-to-run reproducibility)
    val merged = tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct(cols.map(col): _*),
        struct(col(versionCol), col("__src"),
          xxhash64(cols.map(col): _*))).as("__row"))
      .select(col("__row.*"))
    if (dropTombstones) merged.filter(!coalesce(col(deletedCol), lit(false)))
    else merged
  }
}
