package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.StopWords
import graft.util.Tok

/** Document quality scoring for training-data curation (builder brief:
  * length / punctuation / stopword ratios — the C4/Gopher-style rule
  * family, expressed entirely in built-in Spark functions so the whole
  * stage stays inside whole-stage codegen; no UDFs).
  *
  * Integer metrics are emitted alongside the composite score so results
  * are oracle-checkable (ratios of ints are engine-exact; the score is
  * derived per-row from the same ints).
  */
object QualityScore {

  /** Per-doc metrics: token/char counts, punct/digit/stopword counts,
    * mean word length, plus a [0,1] quality score. */
  def metrics(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stopArr = array(StopWords.glasgow.toSeq.sorted.map(lit): _*)
    val toks = split(trim(col(textCol)), Tok.WS)
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(
        col(idCol),
        length(col(textCol)).cast("long").as("n_chars_measured"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => array_contains(stopArr, lower(t)))).cast("long").as("n_stopwords"),
        (length(col(textCol)) - length(regexp_replace(col(textCol), "\\p{Punct}", "")))
          .cast("long").as("n_punct"),
        (length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", "")))
          .cast("long").as("n_digits"),
        size(filter(toks, t => length(t) > 15)).cast("long").as("n_long_tokens"),
      )
      .orderBy(col(idCol))
  }

  /** Composite [0,1] score from the integer metrics (heuristic weights:
    * reward stopword presence & sane length; punish punct/digit excess
    * and very long tokens). */
  def scored(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val m = metrics(docs, idCol, textCol)
    m.withColumn("quality_score",
      round(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.35) * least(lit(1.0), col("n_stopwords") / greatest(col("n_tokens") * 0.1, lit(1.0))) +
          lit(0.35) * least(lit(1.0), col("n_tokens") / lit(50.0)) +
          lit(0.30) * (lit(1.0)
            - least(lit(1.0), col("n_punct") * 5.0 / greatest(col("n_chars_measured"), lit(1)))
            - least(lit(0.5), col("n_digits") * 3.0 / greatest(col("n_chars_measured"), lit(1)))
            - least(lit(0.5), col("n_long_tokens") / greatest(col("n_tokens"), lit(1)) * 2.0)))),
        6))
  }
}
