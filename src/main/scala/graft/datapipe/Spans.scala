package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring-level duplication metrics — the signal behind
  * exact-substring deduplication (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"): how much of each
  * document consists of token spans that occur elsewhere in the
  * corpus. Unlike the minhash family (document-level, approximate)
  * and winnowing (sampled fingerprints), this measures EVERY n-token
  * span exactly.
  *
  * Shape: one md5 per span (codegen'd built-ins, no UDF), a partial-
  * aggregated count per span hash, and a span⇄count shuffle join —
  * work linear in corpus token count, state bounded per key; hot spans
  * (boilerplate) are exactly the AQE skew-join case. No suffix array
  * is materialized: a 100 TB corpus' suffix array would itself be
  * 100 TB-scale, while this needs only the (hash, count) pairs with
  * count > 1 to drive downstream span removal.
  */
object Spans {

  /** Lowercased whitespace tokens of `textCol` (Tok.WS — the corpus
    * tokenization every text op here shares). */
  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), graft.util.Tok.WS), t => t =!= "")

  /** Cross-source overlap matrix: for every source pair (a < b), how
    * many DISTINCT n-token shingles they share — the "which sources
    * duplicate each other" curation diagnostic that decides dedup
    * priorities and mixture double-counting corrections.
    *
    * Scale: ONE row-data shuffle — `groupBy(shingle).collect_set(src)`
    * with state bounded by nSources per key (collect_set dedups
    * map-side, so the exchange carries at most one (shingle, set)
    * per partition). In-set pairs (≤ C(nSources, 2) per shingle,
    * sources are O(10)) explode straight into a partial count whose
    * hash table holds ≤ C(nSources, 2) entries — a postings SELF-JOIN
    * on shingle would instead shuffle the postings twice and
    * materialize the same pairs as join rows. Runtime on the synthetic
    * corpus is worst-case-dense (a tiny vocabulary puts nearly every
    * shingle in every source, ~5.5 s steady-state at sf0.1); real
    * corpora are far sparser and the per-shingle work collapses with
    * the set size. */
  def sourceOverlapMatrix(docs: DataFrame, sourceCol: String,
                          textCol: String, n: Int): DataFrame = {
    require(n >= 2, "shingle length must be >= 2 tokens")
    val t = toks(col(textCol))
    val spans = when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => substring(md5(concat_ws(" ", slice(t, i, lit(n)))), 1, 16)))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col(sourceCol).as("__src"), explode(spans).as("h"))
      .groupBy(col("h")).agg(collect_set(col("__src")).as("ss"))
      .select(explode(expr(
        "flatten(transform(ss, a -> transform(filter(ss, b -> b > a), " +
          "b -> struct(a AS src_a, b AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document span duplication metrics: (idCol, n_spans,
    * n_dup_spans) where spans are all `n`-token windows and a span is
    * dup if its hash occurs more than once in the whole corpus
    * (including repeats within the same document). Documents shorter
    * than `n` tokens have 0 spans. */
  def dupSpanMetrics(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    require(n >= 2, "span length must be >= 2 tokens")
    val t = toks(col(textCol))
    val spans = when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => substring(md5(concat_ws(" ", slice(t, i, lit(n)))), 1, 16)))
      .otherwise(array().cast("array<string>"))
    // explode_outer keeps span-less documents for the final per-doc agg
    val perSpan = docs.select(col(idCol), explode_outer(spans).as("h"))
    val counts = perSpan.filter(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("occ"))
    perSpan.join(counts, Seq("h"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(col("h")).as("n_spans"),
        coalesce(sum(when(col("occ") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_dup_spans"))
  }
}
