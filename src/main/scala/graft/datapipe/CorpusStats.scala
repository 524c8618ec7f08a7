package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.util.{Par, Tok}

/** Corpus-level statistical cards. */
object CorpusStats {

  /** Zipf SLOPE card: least-squares slope of (log2 rank, log2 count)
    * over the top-`k` token frequencies — THE one-number sanity check
    * on a corpus's token distribution (natural language sits near
    * slope −1; heavily-deduplicated or synthetic corpora drift; a
    * pipeline bug that mass-duplicates text shows up here before
    * anything else does). Head-only fitting (top-k) is the standard
    * practice AND the scale guarantee: the regression runs on ≤ k
    * aggregate rows, never the vocabulary.
    *
    * Exact integers end-to-end: logs via
    * [[graft.functions.Log2FixedExpr]] (Q16), the normal-equation
    * sums as BIGINTs (bounded: at k = 1000 every product stays under
    * 2⁶²), and the slope emitted as the EXACT rational
    * (slope_num, slope_den) — slope = num/den — plus a floor(×1000)
    * convenience `slope_milli` computed sign-explicitly so BIGINT
    * truncation (Spark `DIV`) and floor division (DuckDB `//`) agree.
    *
    * Scale shape: one token-keyed partial-agg shuffle for the
    * histogram; top-k lands in TakeOrderedAndProject (per-partition
    * k-heaps, no global sort); the rank window runs on ≤ k rows (the
    * aggregate-row window precedent of q100/q118); totals ride a
    * 1-row cross join. Output: ONE row (n_vocab, n_tokens, n_fit,
    * slope_num, slope_den, slope_milli). */
  def zipfCard(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 1000): DataFrame = {
    require(k >= 2 && k <= 100000, s"k out of range: $k")
    def log2f(c: Column): Column = Expressions.log2_fixed(c, 16)
    // the histogram feeds BOTH the totals and the top-k; eagerly
    // materialize it (vocab-sized — small at any corpus scale) so the
    // corpus explode+agg runs once, not per consumer (q124 precedent)
    val hist = Par.ensure(docs)
      .select(explode(expr(
        s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')"))
        .as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val tot = hist.agg(count(lit(1)).as("n_vocab"),
      coalesce(sum(col("__c")), lit(0L)).as("n_tokens"))
    val top = hist.orderBy(col("__c").desc, col("__w").asc).limit(k)
    val ranked = top.withColumn("__r",
      row_number().over(Window.orderBy(col("__c").desc, col("__w").asc))
        .cast("long"))
    val xy = ranked.select(log2f(col("__r")).as("__x"),
      log2f(col("__c")).as("__y"))
    val s = xy.agg(count(lit(1)).as("__n"),
      coalesce(sum(col("__x")), lit(0L)).as("__sx"),
      coalesce(sum(col("__y")), lit(0L)).as("__sy"),
      coalesce(sum(col("__x") * col("__y")), lit(0L)).as("__sxy"),
      coalesce(sum(col("__x") * col("__x")), lit(0L)).as("__sxx"))
    tot.crossJoin(broadcast(s)).select(
      col("n_vocab"), col("n_tokens"), col("__n").as("n_fit"),
      (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
        .as("slope_num"),
      (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .as("slope_den"))
      .withColumn("slope_milli", expr(
        """CASE WHEN slope_den < 1000 THEN 0
          |WHEN slope_num >= 0
          |  THEN slope_num DIV (slope_den DIV 1000)
          |ELSE -((-slope_num) DIV (slope_den DIV 1000)) END""".stripMargin))
  }
}
