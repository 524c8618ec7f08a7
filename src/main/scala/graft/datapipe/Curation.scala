package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-data curation funnel (the C4/Gopher-style
  * pipeline shape): language gate → quality gate → fuzzy dedup →
  * deterministic sample, each stage a verified operator from this
  * package. The composition itself is on the oracle surface (q54):
  * DuckDB recomputes every stage and the results hash-match.
  *
  * Scale shape (100 TB): the language and quality gates are per-row
  * predicates fused into the scan (no shuffle); dedup shuffles
  * band-key/bucket rows only (never documents); the sample is again a
  * per-row predicate. Total: the dedup stage's two narrow shuffles.
  */
object Curation {

  /** Returns the curated subset of `docs` (all original columns).
    *
    * Stages:
    *  1. keep rows whose `lang` column matches (metadata gate);
    *  2. keep rows passing the quality thresholds (min token count,
    *     max punctuation ratio) via [[QualityScore.metrics]];
    *  3. drop fuzzy duplicates: [[DedupOps.minhashDedupSurvivors]]
    *     keeps the min-id member of every near-dup pair (word-3-gram
    *     Jaccard ≥ `minJaccard` verified exactly on LSH candidates);
    *  4. [[Sampling.uniform]] hash-sample down to `sampleFraction`.
    */
  def curate(docs: DataFrame,
             lang: String = "en",
             minTokens: Long = 30,
             maxPunctRatio: Double = 0.2,
             minJaccard: Double = 0.5,
             sampleFraction: Double = 0.5,
             md5Based: Boolean = false): DataFrame = {
    val gated = docs.filter(col("lang") === lang)
    val okIds = QualityScore.metrics(gated)
      .filter(col("n_tokens") >= minTokens &&
        col("n_punct") < lit(maxPunctRatio) * col("n_chars_measured"))
      .select(col("doc_id"))
    val quality = gated.join(okIds, Seq("doc_id"), "left_semi")
    val deduped = DedupOps.minhashDedupSurvivors(quality, minJaccard,
      md5Based = md5Based)
    Sampling.uniform(deduped, "doc_id", sampleFraction)
  }
}
