package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents sharing
  * word n-gram shingles with an evaluation set — the decontamination
  * gate every LLM data pipeline runs before training (the production
  * setting uses 13-grams; the n is a parameter).
  *
  * Execution shape: the EVAL side is the small side — its distinct
  * shingle set broadcasts; training documents explode to (doc,
  * shingle) postings and inner-join the broadcast, so only matching
  * postings survive into the per-document count. No pairwise document
  * comparison is ever materialized: cost is (train shingles) × hash
  * probe. Shingles are plain normalized word n-gram STRINGS (engine-
  * portable; hash them for a real 100 TB run to cut shuffle width —
  * same plan shape).
  */
object Contamination {

  /** Distinct word n-gram shingle array for a text column (documents
    * shorter than n collapse to one whole-text shingle; empty texts
    * are dropped by the caller's filter). */
  def shingles(text: Column, n: Int): Column = {
    val toks = filter(split(lower(text), graft.util.Tok.WS), t => t =!= "")
    array_distinct(
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
  }

  /** Training documents (idCol) with at least one shingle shared with
    * `eval`: (id, n_shared). `eval`'s distinct shingles broadcast. */
  def contaminated(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val evalShingles = eval_
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(shingles(col(textCol), n)).as("__sh"))
      .distinct()
    train
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__sh"))
      .join(broadcast(evalShingles), Seq("__sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The decontamination ACTION: the training corpus with every
    * document sharing ≥ `minShared` distinct eval shingles REMOVED —
    * what a pipeline actually feeds the trainer after the q73-style
    * scan. Detection is [[contaminated]]; removal is one broadcastable
    * anti-join on the (small) flagged-id set, so the action adds no
    * new scale risk: survivors keep all their columns and the corpus
    * is never shuffled. */
  def decontaminate(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long = 1L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1: $minShared")
    val flagged = contaminated(train, eval_, idCol, textCol, n)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
