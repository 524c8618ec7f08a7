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
    // explode_OUTER + null filter instead of plain explode: a non-outer
    // Generate triggers InferFiltersFromGenerate, which pushes TWO full
    // copies of the span-md5 expression below the exchange into the
    // single-split scan task (measured ~3 s of q84's 4.7 s at sf0.1);
    // outer generates are exempt, and the Par.ensure guard gives the
    // per-span md5 work the cluster's parallelism instead of the
    // 1-file scan's single task. Results identical: empty span arrays
    // emit one null row the filter drops.
    graft.util.Par.ensure(docs)
      .select(col(sourceCol).as("__src"), explode_outer(spans).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("h")).agg(collect_set(col("__src")).as("ss"))
      .select(explode(expr(
        "flatten(transform(ss, a -> transform(filter(ss, b -> b > a), " +
          "b -> struct(a AS src_a, b AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Exact-substring span REMOVAL (Lee et al. 2022's dedup action,
    * not just the measurement): every occurrence of a duplicated
    * `n`-token span except the corpus-wide FIRST is removed from the
    * text. "First" is the deterministic keep-first policy: for each
    * duplicated span hash, the keeper occurrence is the minimum
    * (doc, offset) pair — so intra-document repeats after the first
    * are removed too, and the output is independent of partitioning.
    * A token is dropped iff at least one non-keeper occurrence of a
    * duplicated span covers it.
    *
    * Returns (idCol, n_tokens, n_kept, clean_text) where clean_text
    * is the surviving tokens (lowercased, whitespace-normalized — the
    * shared corpus token space) joined by single spaces; documents
    * shorter than `n` tokens pass through untouched (in token space).
    *
    * Shape — fully relational, no per-document quadratic work: span
    * hashing is codegen'd (`transform`/`md5`/`slice`), the keeper is
    * one `min(struct(doc, offset))` partial aggregate per span hash,
    * and survivors come from a LEFT ANTI join on (doc, position) —
    * every stage shuffles on a key (span hash or doc id) with per-key
    * state bounded by document length. Removed token positions are
    * COALESCED before that anti-join: non-keeper occurrence starts are
    * gathered per document (one keyed agg, map-side-combined) and each
    * start emits only its newly covered suffix — for sorted starts
    * s_0 < s_1 < …, start s_k covers [max(s_k, s_{k-1}+n), s_k+n−1],
    * which is disjoint and complete — so the (doc, position) shuffle
    * carries each removed position exactly ONCE instead of up to n
    * times for overlapping duplicate runs (n× for boilerplate-heavy
    * text). At 100 TB this is the same span⇄count topology as
    * [[dupSpanMetrics]] plus one keyed anti-join; boilerplate-heavy
    * hot spans are the AQE skew-join case, never a driver problem. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String,
                           textCol: String, n: Int): DataFrame = {
    require(n >= 2, "span length must be >= 2 tokens")
    val withToks = docs.select(col(idCol), toks(col(textCol)).as("ts"))
    val spanStructs = when(size(col("ts")) >= n,
      transform(sequence(lit(1), size(col("ts")) - (n - 1)),
        i => struct(i.as("i"),
          substring(md5(concat_ws(" ", slice(col("ts"), i, lit(n)))), 1, 16)
            .as("h"))))
      .otherwise(expr("CAST(array() AS array<struct<i:int,h:string>>)"))
    val occ = withToks
      .select(col(idCol).as("__d"), explode(spanStructs).as("s"))
      .select(col("__d"), col("s.i").as("i"), col("s.h").as("h"))
    // Keeper per duplicated hash: global min (doc, offset). One
    // partial-aggregated pass over the span stream.
    val keep = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("occ_n"),
        min(struct(col("__d"), col("i"))).as("k"))
    // Token positions covered by a non-keeper occurrence of a dup
    // span, each emitted exactly once: gather the sorted distinct
    // occurrence starts per document, then start s_k contributes the
    // positions [max(s_k, s_{k-1}+n), s_k+n-1] — the part of its
    // window no earlier start already covers (disjoint + complete
    // since starts are sorted and windows share width n).
    val removed = occ.join(keep, Seq("h"))
      .filter(col("occ_n") > 1 &&
        !(col("__d") === col("k.__d") && col("i") === col("k.i")))
      .groupBy(col("__d"))
      .agg(array_sort(collect_set(col("i"))).as("ss"))
      .select(col("__d"), explode(expr(
        s"""flatten(transform(ss, (s, k) -> sequence(
           |CASE WHEN k = 0 THEN s ELSE greatest(s, element_at(ss, k) + $n) END,
           |s + ${n - 1})))""".stripMargin)).as("j"))
    val tokenPos = withToks
      .select(col(idCol).as("__d"), posexplode(col("ts")).as(Seq("j0", "tok")))
      .select(col("__d"), (col("j0") + 1).as("j"), col("tok"))
    val kept = tokenPos.join(removed, Seq("__d", "j"), "left_anti")
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("j"),
          col("tok")))), p => p("tok"))).as("clean_text"))
    withToks.select(col(idCol), size(col("ts")).cast("long").as("n_tokens"))
      .join(kept.withColumnRenamed("__d", idCol), Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** SENTENCE-level dedup — metrics AND keep-first removal in one
    * pass: the C4 convention (Raffel et al. 2020 deduplicate repeated
    * sentence spans; RefinedWeb's line dedup is the same idea at line
    * grain — this corpus is newline-free, so sentences are the
    * natural grain between q12's whole-document and q89's n-token
    * spans). Sentences split on `[.!?]+` + whitespace and NORMALIZED
    * (lowercase, trimmed, trailing end-punctuation stripped) — the
    * same normalized-space convention as [[removeDuplicateSpans]]'
    * token space, and the regex is RE2-safe (no lookbehind) so the
    * oracle splits identically. Keep-first policy: for each distinct
    * normalized sentence, the global minimum (doc, position)
    * occurrence survives; every other occurrence is removed.
    *
    * Output: (idCol, n_sents, n_dup_sents, n_kept, clean_text) —
    * n_dup_sents counts occurrences whose sentence occurs >1 time in
    * the corpus (the dup-sentence-fraction numerator); clean_text is
    * the surviving normalized sentences joined by ". ".
    *
    * Scale shape: one 16-byte-hash keyed agg for the keeper (min
    * struct, map-side combined), one hash-keyed join back, one
    * doc-keyed agg to reassemble — per-key state bounded by document
    * sentence counts; hot boilerplate sentences are the AQE skew-join
    * case. */
  def sentenceDedup(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val occ = sentenceOccurrences(docs, idCol, textCol)
    val keep = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("occ_n"),
        min(struct(col("__d"), col("j"))).as("k"))
    val flagged = occ.join(keep, Seq("h"))
      .select(col("__d"), col("j"), col("sn"),
        when(col("occ_n") > 1, 1L).otherwise(0L).as("__dup"),
        when(col("__d") === col("k.__d") && col("j") === col("k.j"), 1L)
          .otherwise(0L).as("__keep"))
    val perDoc = flagged.groupBy(col("__d")).agg(
      count(lit(1)).as("n_sents"),
      sum(col("__dup")).as("n_dup_sents"),
      sum(col("__keep")).as("n_kept"),
      concat_ws(". ", expr(
        "transform(array_sort(filter(collect_list(struct(j, __keep, sn)), " +
          "x -> x.__keep = 1)), x -> x.sn)")).as("clean_text"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("__d", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_dup_sents"), lit(0L)).as("n_dup_sents"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The shared sentence stream of the sentence-dedup family:
    * normalized sentences with 0-based positions and 16-byte hashes —
    * (__d, j, h, sn). Null/empty docs emit no rows (callers left-join
    * back). */
  private def sentenceOccurrences(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ws = graft.util.Tok.WsSqlLit
    docs.select(col(idCol), posexplode_outer(expr(
      s"""filter(transform(split(lower(coalesce($textCol, '')), '[.!?]+$ws'),
         |  s -> regexp_replace(trim(s), '[.!?]+$$', '')), s -> s != '')"""
        .stripMargin)).as(Seq("j", "sn")))
      .filter(col("sn").isNotNull)
      .select(col(idCol).as("__d"), col("j"),
        substring(md5(col("sn")), 1, 16).as("h"), col("sn"))
  }

  /** Persisted sentence-hash INDEX of a corpus: one row per DISTINCT
    * normalized sentence — the artifact that makes sentence dedup
    * incremental (the [[graft.datapipe.DedupOps.minhashIndex]]
    * pattern at sentence grain). Hash the corpus ONCE, persist this
    * relation, and dedup every arriving batch against it with work ∝
    * batch, never ∝ corpus. */
  def sentenceIndex(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    sentenceOccurrences(docs, idCol, textCol)
      .groupBy(col("h")).agg(count(lit(1)).as("n_occ"))

  /** INCREMENTAL sentence dedup: a batch deduped against a persisted
    * [[sentenceIndex]] plus itself. Steady-state semantics (the q75
    * convention): the indexed corpus came FIRST, so any batch
    * occurrence of an indexed sentence is removed regardless of doc
    * ids — arrival order beats id order; within the batch the
    * keep-first rule is the same min-(doc, position) as
    * [[sentenceDedup]]. Output: (idCol, n_sents, n_dup_index,
    * n_dup_batch, n_kept, clean_text).
    *
    * Scale shape: one hash-keyed left join of the BATCH sentence
    * stream against the index (per-batch work ∝ batch sentences +
    * their index hits), one keyed keeper agg over the batch-only
    * remainder, one doc-keyed reassembly. The corpus is never
    * rescanned. */
  def sentenceDedupIncremental(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val occ = sentenceOccurrences(batch, idCol, textCol)
    val flagged = occ.join(index.select(col("h"), lit(1L).as("__ix")),
      Seq("h"), "left_outer")
    val fresh = flagged.filter(col("__ix").isNull)
    val keep = fresh.groupBy(col("h"))
      .agg(count(lit(1)).as("__occ_n"),
        min(struct(col("__d"), col("j"))).as("k"))
    val resolved = flagged.filter(col("__ix").isNotNull)
      .select(col("__d"), col("j"), col("sn"),
        lit(1L).as("__dup_ix"), lit(0L).as("__dup_b"), lit(0L).as("__keep"))
      .unionByName(fresh.join(keep, Seq("h"))
        .select(col("__d"), col("j"), col("sn"),
          lit(0L).as("__dup_ix"),
          when(col("__occ_n") > 1, 1L).otherwise(0L).as("__dup_b"),
          when(col("__d") === col("k.__d") && col("j") === col("k.j"), 1L)
            .otherwise(0L).as("__keep")))
    val perDoc = resolved.groupBy(col("__d")).agg(
      count(lit(1)).as("n_sents"),
      sum(col("__dup_ix")).as("n_dup_index"),
      sum(col("__dup_b")).as("n_dup_batch"),
      sum(col("__keep")).as("n_kept"),
      concat_ws(". ", expr(
        "transform(array_sort(filter(collect_list(struct(j, __keep, sn)), " +
          "x -> x.__keep = 1)), x -> x.sn)")).as("clean_text"))
    batch.select(col(idCol))
      .join(perDoc.withColumnRenamed("__d", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_dup_index"), lit(0L)).as("n_dup_index"),
        coalesce(col("n_dup_batch"), lit(0L)).as("n_dup_batch"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
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
    // explode_outer keeps span-less documents for the final per-doc agg.
    // Par.ensure: this subtree executes twice (counts + join side) and
    // would otherwise run the whole per-span md5 work in the 1-file
    // scan's single task both times (measured ~3 s of q82's 3.8 s).
    val perSpan = graft.util.Par.ensure(docs)
      .select(col(idCol), explode_outer(spans).as("h"))
    val counts = perSpan.filter(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("occ"))
    perSpan.join(counts, Seq("h"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(col("h")).as("n_spans"),
        coalesce(sum(when(col("occ") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_dup_spans"))
  }
}
