package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Publication

/** Latest-version-per-PMID dedup with deletion tombstones (SURVEY §2.3
  * J2 / §2.4 A1-A2; reference main.py:576-587, 777-780).
  *
  * Beam shape: GroupByKey(pub_id) → sort versions by source filename →
  * keep last; a tombstone from a newer updatefile deletes the article.
  *
  * Spark shape: `groupBy(pub_id).agg(max_by(struct(*), filename))` —
  * ONE hash shuffle with map-side partial aggregation, which at 100 TB
  * beats the window-function formulation (window = full shuffle + per-
  * partition sort; max_by combines before the exchange, so the shuffle
  * carries at most one row per pub_id per input partition).
  *
  * Filename ordering is lexicographic, meaningful for MEDLINE
  * (`pubmedYYnNNNN` numbering; updatefiles sort after baseline —
  * reference main.py:585).
  */
object Dedup {

  /** Latest version of every pub_id (tombstones can win), as Publication. */
  def latestVersion(spark: SparkSession, parsed: Dataset[Publication]): Dataset[Publication] = {
    import spark.implicits._
    val df = parsed.toDF()
    // Ordering key is (filename, is_deleted): ties on filename — one
    // file carrying both a revision and a tombstone for the same PMID —
    // deterministically resolve to the tombstone (false < true), instead
    // of max_by's first-of-max encounter order.
    val latest = df
      .groupBy(col("pub_id"))
      .agg(max_by(struct(df.columns.map(col).toIndexedSeq: _*),
        struct(col("filename"), col("is_deleted"))).as("latest"))
      .select(col("latest.*"))
    latest.as[Publication]
  }

  /** Latest non-deleted version of every pub_id — the pipeline's dedup +
    * tombstone application (reference main.py:777-780). */
  def latestNonDeleted(spark: SparkSession, parsed: Dataset[Publication]): Dataset[Publication] = {
    import spark.implicits._
    latestVersion(spark, parsed).filter(p => !p.is_deleted)
  }

  /** DataFrame variant for generic tables: latest row per key by ordCol. */
  def latestByKey(df: DataFrame, keyCol: String, ordCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(max_by(struct(df.columns.map(col).toIndexedSeq: _*), col(ordCol)).as("latest"))
      .select(col("latest.*"))
}
