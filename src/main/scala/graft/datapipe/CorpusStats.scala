package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.util.{Par, Tok}

/** Corpus-level statistical cards. */
object CorpusStats {

  /** HEAPS'-law vocabulary-GROWTH curve: for every document (in
    * doc-id order), the cumulative token count and cumulative DISTINCT
    * vocabulary after processing it — the companion diagnostic to
    * [[zipfCard]] (natural corpora grow vocabulary ≈ K·nᵝ, β ≈ 0.5;
    * a synthetic or template corpus flattens almost immediately, and
    * a crawl whose curve suddenly steepens changed domain mid-stream).
    * "First seen" is attributed to the MINIMUM doc id containing the
    * token, so the curve is a pure function of the corpus.
    *
    * Scale shape: token first-seen is one (token → min doc) partial
    * agg (vocabulary-sized, never collected); per-doc news/token
    * counts join on doc id; the two cumulative sums use VALUE-BANDED
    * prefix sums over doc-id ranges (floor(id / 2²⁰) bands — per-band
    * totals are aggregate rows, the only window over row data is
    * within one band) — never a single-partition global window.
    * Output: (idCol, n_tokens, n_new_tokens, cum_tokens, cum_vocab). */
  def heapsCurve(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = tokenStream(docs, idCol, textCol)
    val perDocTokens = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"))
    val firstSeen = toks.groupBy(col("__w")).agg(min(col(idCol)).as("__fd"))
    val perDocNew = firstSeen.groupBy(col("__fd").as(idCol))
      .agg(count(lit(1)).as("n_new_tokens"))
    heapsFromParts(docs.select(col(idCol)), perDocTokens, perDocNew, idCol)
  }

  /** One row per token OCCURRENCE: (idCol, __w) — the shared front of
    * both cards and the [[tokenIndex]]. */
  private def tokenStream(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Par.ensure(docs).select(col(idCol),
      explode(expr(
        s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')"))
        .as("__w"))

  /** The banded-prefix-sum back half of the Heaps' curve, from the
    * full doc-id list plus the two per-doc relations. */
  private def heapsFromParts(ids: DataFrame, perDocTokens: DataFrame,
      perDocNew: DataFrame, idCol: String): DataFrame = {
    val bandW = 1L << 20
    val base = ids
      .join(perDocTokens, Seq(idCol), "left_outer")
      .join(perDocNew, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_new_tokens"), lit(0L)).as("n_new_tokens"))
      .withColumn("__band", floor(col(idCol) / bandW).cast("long"))
    val bandTotals = base.groupBy(col("__band").as("__ob"))
      .agg(sum(col("n_tokens")).as("__bt"), sum(col("n_new_tokens")).as("__bv"))
      .withColumn("__offt", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__ob"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__offv", coalesce(sum(col("__bv")).over(
        Window.orderBy(col("__ob"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__ob"), col("__offt"), col("__offv"))
    val wBand = Window.partitionBy(col("__band")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__lt", sum(col("n_tokens")).over(wBand))
      .withColumn("__lv", sum(col("n_new_tokens")).over(wBand))
      .join(broadcast(bandTotals), col("__band") === col("__ob"))
      .select(col(idCol), col("n_tokens"), col("n_new_tokens"),
        (col("__offt") + col("__lt")).as("cum_tokens"),
        (col("__offv") + col("__lv")).as("cum_vocab"))
  }

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
    * (slope_num, slope_den) — slope = num/den — plus a convenience
    * `slope_milli` defined as the EXACT replayed integer formula
    * `sign(num) · (|num| DIV (den DIV 1000))` (0 when den < 1000):
    * the inner truncation of den makes this ≈ floor(1000·slope) with
    * up to ~0.1% relative error, the price of keeping every product
    * inside BIGINT with no widening; `slope_num`/`slope_den` are the
    * exact answer, `slope_milli` is the display form. Sign-explicit
    * so BIGINT truncation (Spark `DIV`) and floor division (DuckDB
    * `//`) agree.
    *
    * Scale shape: one token-keyed partial-agg shuffle for the
    * histogram; top-k lands in TakeOrderedAndProject (per-partition
    * k-heaps, no global sort); the rank window runs on ≤ k rows (the
    * aggregate-row window precedent of q100/q118); totals ride a
    * 1-row cross join. Output: ONE row (n_vocab, n_tokens, n_fit,
    * slope_num, slope_den, slope_milli). */
  def zipfCard(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 1000): DataFrame = {
    // the histogram feeds BOTH the totals and the top-k; eagerly
    // materialize it (vocab-sized — small at any corpus scale) so the
    // corpus explode+agg runs once, not per consumer (q124 precedent)
    val hist = tokenStream(docs, idCol, textCol)
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    zipfFromHist(hist, k)
  }

  /** The Zipf regression from a `(__w, __c)` histogram relation. */
  private def zipfFromHist(hist: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k out of range: $k")
    def log2f(c: Column): Column = Expressions.log2_fixed(c, 16)
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

  /** Persisted TOKEN INDEX of a corpus: one row per distinct token —
    * `(token, n_occ, first_doc)` — the artifact that gives both
    * corpus cards a steady-state incremental form (the
    * [[Spans.sentenceIndex]] / q75 pattern at token grain). Hash the
    * corpus once, persist this vocabulary-sized relation, then fold
    * each arriving batch in with [[tokenIndexMerge]] and recompute
    * the cards from the index with [[zipfCardFromIndex]] /
    * [[heapsCurveFromIndex]] — the corpus itself is never rescanned.
    * Counts ADD and first-seen doc ids MIN across batches, so the
    * merged index is a pure function of the union corpus regardless
    * of batch boundaries (spec-pinned batch ≡ incremental). */
  def tokenIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    tokenStream(docs, idCol, textCol)
      .groupBy(col("__w").as("token"))
      .agg(count(lit(1)).as("n_occ"), min(col(idCol)).as("first_doc"))

  /** Fold any union of [[tokenIndex]] relations (a base plus delta
    * indexes) into the index of the union corpus: counts sum,
    * first-seen docs min — both associative+commutative, so the fold
    * is a pure function of the union corpus regardless of how it was
    * sliced into parts. This is the READ-side half of the base+delta
    * layout ([[graft.streaming.StreamingPipeline.tokenIndexStream]]):
    * batches WRITE only their own batch-sized delta index; the
    * vocabulary-sized fold runs on demand (and at periodic
    * compaction), never on the per-batch write path. */
  def tokenIndexFold(parts: DataFrame): DataFrame =
    parts.groupBy(col("token"))
      .agg(sum(col("n_occ")).as("n_occ"),
        min(col("first_doc")).as("first_doc"))

  /** Fold a new batch into a persisted [[tokenIndex]]: counts sum,
    * first-seen docs min. One vocabulary-keyed partial agg over
    * index ∪ batch-index — per-merge work ∝ vocabulary + batch
    * tokens, never ∝ corpus occurrences. (The q133/q134 one-shot
    * faces; the streaming path amortizes further with the
    * [[tokenIndexFold]] base+delta layout so per-BATCH writes are
    * ∝ batch only.) */
  def tokenIndexMerge(index: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenIndexFold(index.unionByName(tokenIndex(batch, idCol, textCol)))

  /** [[zipfCard]] recomputed from a persisted [[tokenIndex]]: the
    * identical regression over the index's `(token, n_occ)` histogram
    * — bit-identical to the batch card on the same corpus. */
  def zipfCardFromIndex(index: DataFrame, k: Int = 1000): DataFrame =
    zipfFromHist(index.select(col("token").as("__w"),
      col("n_occ").as("__c")), k)

  /** Per-document token counts `(idCol, n_tokens)` — the append-only
    * companion relation of [[tokenIndex]] (a document's count never
    * changes once written; each batch appends its own rows). Includes
    * zero rows for token-free documents so
    * [[heapsCurveFromIndex]] sees the full doc-id list. */
  def docTokenCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perDoc = tokenStream(docs, idCol, textCol)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** [[heapsCurve]] recomputed from the persisted [[tokenIndex]] plus
    * the append-only [[docTokenCounts]] relation: first-seen news per
    * doc from the index's `first_doc`, token mass from the counts
    * relation, then the same banded prefix sums — bit-identical to
    * the batch curve on the same corpus (first-seen is min-doc-id in
    * both, a pure function of the union corpus). */
  def heapsCurveFromIndex(index: DataFrame, docCounts: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val perDocNew = index.groupBy(col("first_doc").as(idCol))
      .agg(count(lit(1)).as("n_new_tokens"))
    heapsFromParts(docCounts.select(col(idCol)),
      docCounts.select(col(idCol), col("n_tokens")), perDocNew, idCol)
  }
}
