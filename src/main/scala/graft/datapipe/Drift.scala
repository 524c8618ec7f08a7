package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.util.Tok

/** Distribution-drift monitoring: Population Stability Index between
  * a reference slice and an incoming slice of a corpus — the gate a
  * production pipeline puts between ingestion and training ("has the
  * crawl's length/language mix shifted enough to re-tune filters?").
  * PSI = Σ_bins (p_i − q_i)·log(p_i/q_i), the symmetric KL sum; the
  * conventional alert thresholds (0.1 = drifting, 0.25 = major) are
  * in natural-log units — ours are log2·2¹⁶ fixed point (multiply by
  * ln 2 to convert), chosen so the whole card is EXACT integers and
  * hash-checkable across engines ([[Expressions.log2_fixed]], the
  * q120/q124 convention — IEEE ln differs in ULPs across engines,
  * floored integer log2 does not).
  *
  * Exact-integer form, per bin (add-1 Laplace smoothing so empty
  * bins are defined; B = bin count, R/N = slice totals, r1 = r+1,
  * R1 = R+B, …):
  *
  *   p_i/q_i = (r1·N1)/(n1·R1)
  *   dlog    = log2f(r1·N1) − log2f(n1·R1)          (Q16)
  *   term    = (r1·N1 − n1·R1) · dlog               (≥ 0 up to floor)
  *   PSI·R1·N1·2¹⁶ = Σ terms                        (the emitted psi_num)
  *
  * Plan shape: one projection + one (axis, bin)-keyed partial
  * aggregation over the corpus — bin counting is the only pass that
  * touches row data. Everything after (totals, logs, terms) runs on
  * the BIN-SIZED card relation (aggregate-row windows + a native
  * constant-codegen log expression), the [[Importance]]/[[QualityScore]]
  * discipline: logs on model-sized relations only. Log2FixedExpr's
  * loud [1, 2⁴²) domain bounds r1·N1 — at planet scale compute the
  * card on a bounded sample per slice (the statistic is scale-free).
  */
object Drift {

  /** PSI card over two interleaved slices of `docs` (ref = even
    * doc_id, new = odd — the q138 split convention) along two axes:
    * token-length bins (width 16, clamped at 15) and language.
    * Output, one row per (axis, bin): counts, smoothed totals, the
    * Q16 log-ratio diagnostic, the exact integer term, and the
    * per-axis psi_num = Σ terms (constant within an axis). */
  /** The per-document (n_tok, lang) projection both drift statistics
    * bin over. */
  def docStats(docs: DataFrame): DataFrame = {
    val ntok = when(col("text").isNull, lit(0L)).otherwise(
      size(filter(split(lower(col("text")), Tok.WS), t => t =!= ""))
        .cast("long"))
    docs.select(col("doc_id"), ntok.as("n_tok"),
      coalesce(col("lang"), lit("??")).as("lang"))
  }

  /** (axis, bin, ref_cnt, new_cnt) bin counts for a slice pair —
    * `isRef` marks the reference side. The ONLY pass over row data;
    * this is also the mergeable state the streaming face persists
    * per batch (counts add). */
  def binCounts(stats: DataFrame, isRef: Column): DataFrame = {
    val len = stats.select(lit("len").as("axis"),
      format_string("%02d", least(expr("n_tok div 16"), lit(15L))).as("bin"),
      isRef.as("is_ref"))
    val lng = stats.select(lit("lang").as("axis"), col("lang").as("bin"),
      isRef.as("is_ref"))
    len.unionByName(lng)
      .groupBy(col("axis"), col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("new_cnt"))
  }

  /** The PSI card math over (axis, bin, ref_cnt, new_cnt) — bin-sized
    * input, shared verbatim by the batch query and the streaming
    * snapshot so the two faces cannot diverge. */
  def cardFromCounts(card0: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("axis"))
    card0
      .withColumn("ref_tot1", sum(col("ref_cnt")).over(w) + count(lit(1)).over(w))
      .withColumn("new_tot1", sum(col("new_cnt")).over(w) + count(lit(1)).over(w))
      .withColumn("xa", (col("ref_cnt") + 1L) * col("new_tot1"))
      .withColumn("xb", (col("new_cnt") + 1L) * col("ref_tot1"))
      .withColumn("dlog_q16",
        Expressions.log2_fixed(col("xa"), 16) -
          Expressions.log2_fixed(col("xb"), 16))
      .withColumn("term_num", (col("xa") - col("xb")) * col("dlog_q16"))
      .withColumn("psi_num", sum(col("term_num")).over(w))
      .select(col("axis"), col("bin"), col("ref_cnt"), col("new_cnt"),
        col("ref_tot1"), col("new_tot1"), col("dlog_q16"),
        col("term_num"), col("psi_num"))
  }

  def psiCard(docs: DataFrame): DataFrame =
    cardFromCounts(binCounts(docStats(docs), col("doc_id") % 2 === 0))

  /** Embedding-space drift (q165): the PSI card over the EMBEDDING
    * table — axis `emb_c0` bins the first component (×16, offset 8,
    * clamped to 0..15: unit-norm components sit in ±0.4, so the grid
    * spans the mass; the float→double×16 product is IEEE-exact, so
    * floor is engine-portable — the q139 quantization convention) and
    * axis `label` is the categorical cluster-proportion mix. This is
    * the representation-drift gate ("did the embedding distribution
    * move between corpus versions?") that catches what token-level
    * drift (q159) can't — a new data source can keep lengths and
    * languages stable while landing in a different region of
    * embedding space. Same bin-sized card math ([[cardFromCounts]]),
    * same streaming mechanism if fed embedding batches. */
  def embPsiCard(emb: DataFrame): DataFrame = {
    val c0 = floor(element_at(col("embedding"), 1).cast("double") * 16)
      .cast("long") + 8L
    val a = emb.select(lit("emb_c0").as("axis"),
      format_string("%02d", greatest(lit(0L), least(lit(15L), c0))).as("bin"),
      (col("vec_id") % 2 === 0).as("is_ref"))
    val b = emb.select(lit("label").as("axis"),
      format_string("%02d", col("label").cast("long")).as("bin"),
      (col("vec_id") % 2 === 0).as("is_ref"))
    val counts = a.unionByName(b)
      .groupBy(col("axis"), col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("new_cnt"))
    cardFromCounts(counts)
  }

  /** Exact two-sample Kolmogorov–Smirnov distance (q164) between the
    * same slices over the RAW token-length distribution — the
    * bin-free companion to [[psiCard]] (PSI depends on the binning;
    * KS is the sup-norm CDF gap, sensitive to any location shift the
    * bins might straddle). Exact integers throughout: at each
    * distinct observed value v,
    *
    *   d_num(v) = |cumref(v)·N − cumnew(v)·R|     (denominator R·N)
    *
    * and the statistic is ks_num = max_v d_num (D = ks_num/(R·N);
    * the classical α=0.05 threshold 1.358·√((R+N)/(R·N)) is the
    * consumer's float to take). One keyed count over row data; the
    * CDF windows run on the DISTINCT-VALUE relation (bounded by the
    * length clamp a pipeline applies upstream — aggregate-row
    * windows only). Output per distinct value: cumulative counts,
    * d_num, and the constant ks_num / ref_n / new_n columns. */
  def ksCard(docs: DataFrame): DataFrame =
    ksFromCounts(valueCounts(docStats(docs), col("doc_id") % 2 === 0))

  /** (n_tok, r, n) value-level counts for a slice pair — the
    * mergeable state the streaming KS face persists per batch
    * (bounded by the distinct token-length support, which a length
    * clamp bounds upstream). */
  def valueCounts(stats: DataFrame, isRef: Column): DataFrame =
    stats.groupBy(col("n_tok"))
      .agg(sum(when(isRef, 1L).otherwise(0L)).as("r"),
        sum(when(!isRef, 1L).otherwise(0L)).as("n"))

  /** The KS math over (n_tok, r, n) — value-sized input, shared by
    * the batch query and the streaming snapshot. */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    val wcum = Window.orderBy(col("n_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(lit(1))
    counts
      .withColumn("cum_ref", sum(col("r")).over(wcum))
      .withColumn("cum_new", sum(col("n")).over(wcum))
      .withColumn("ref_n", sum(col("r")).over(wall))
      .withColumn("new_n", sum(col("n")).over(wall))
      .withColumn("d_num", abs(
        col("cum_ref") * col("new_n") - col("cum_new") * col("ref_n")))
      .withColumn("ks_num", max(col("d_num")).over(wall))
      .select(col("n_tok"), col("cum_ref"), col("cum_new"),
        col("ref_n"), col("new_n"), col("d_num"), col("ks_num"))
  }
}
