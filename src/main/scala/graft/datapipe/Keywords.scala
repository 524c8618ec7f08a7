package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction — the TF-IDF-family text-analysis
  * op of an LLM data pipeline (topic tagging, mixture diagnostics,
  * index enrichment).
  *
  * Ranking is (tf desc, df asc, term asc): term frequency first,
  * corpus-wide document frequency as the rarity tiebreak. This is the
  * TF-IDF order restricted to integer comparisons — deliberately NOT
  * the float score tf·ln(N/df), because `ln` is not bit-portable
  * across engines (1-ulp drift would make integer-coincidence ties
  * like 2·ln(10) vs ln(100) order differently in Spark and a DuckDB
  * oracle). Consumers that want the float score compute it downstream
  * from the exact (tf, df) pair this op emits.
  *
  * Scale shape (100 TB):
  *  - tf = groupBy(doc, term): partial-aggregated, one shuffle keyed
  *    (doc, term) — never a per-doc collect.
  *  - df is derived from tf (already one row per (doc, term)), so the
  *    df aggregation shuffles the DISTINCT pairs, not raw tokens.
  *  - tf ⋈ df on term: shuffle join (the vocabulary of a web corpus is
  *    too large to broadcast); AQE handles hot terms.
  *  - per-doc top-k: a window by doc_id, which is safe HERE (unlike a
  *    per-source window) because the partition size is bounded by one
  *    document's distinct-term count, not by corpus skew.
  */
object Keywords {

  /** Top `k` keywords per document: (idCol, rank, term, tf, df).
    * Tokens are lowercased whitespace splits with `stopwords` and
    * empties removed — the same portable tokenization as the quality
    * and repetition ops (Tok.WS). */
  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
                  k: Int, stopwords: Set[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stopDim = stopwords.toSeq.toDF("__stop")
    val toks = docs
      .select(col(idCol), explode(split(lower(col(textCol)),
        graft.util.Tok.WS)).as("term"))
      .filter(col("term") =!= "")
      // broadcast anti-join beats an in-filter for a multi-thousand-word
      // stopword list (single hashed build side, codegen probe)
      .join(broadcast(stopDim), col("term") === col("__stop"), "left_anti")
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }
}
