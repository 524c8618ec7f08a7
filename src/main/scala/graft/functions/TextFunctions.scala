package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{AbbreviationFinder, BioTokenizer, TextNormalizer}
import graft.util.Tables

/** Text-analysis functions over document tables (builder brief: token
  * counting, quality scoring, language-ID, fingerprinting) built on the
  * pure-Scala text core (graft.text).
  *
  * Scale: every function here is a deterministic per-row map — no
  * shuffle, fully parallel, pipelined into whole-stage codegen up to the
  * UDF boundary. The UDFs hold no state (object methods), so executor
  * reuse costs nothing.
  */
object TextFunctions {

  /** Token count via the bio tokenizer. UDF form for callers that need
    * a plain udf; prefer [[Expressions.bio_token_count]] (native
    * codegen) in plans — both delegate to BioTokenizer.tokenCount so
    * semantics cannot drift. */
  val bioTokenCount = udf((s: String) => BioTokenizer.tokenCount(s))

  /** Sentence count via the rule-based splitter. */
  val sentenceCount = udf((s: String) =>
    if (s == null) 0 else BioTokenizer.sentences(s).length)

  /** ASCII/greek normalization (reference NLP.py:164-223). */
  val normalizeText = udf((s: String) =>
    if (s == null) null else TextNormalizer.normalize(s))

  /** Schwartz-Hearst abbreviations as array<struct<short,long>>. */
  val findAbbreviations = udf((s: String) =>
    if (s == null) Seq.empty[(String, String)]
    else AbbreviationFinder.find(s).map(a => (a.short, a.long)))

  /** Token + sentence stats per document; oracle-checkable because the
    * synthetic documents are punctuation-free so bio-token count equals
    * whitespace-split count. */
  def docTokenStats(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"),
        // native codegen expression, not the UDF (Expressions.scala)
        Expressions.bio_token_count(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("text_len"),
        col("n_chars"))
      .orderBy(col("doc_id"))
  }
}
