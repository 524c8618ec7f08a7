package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (builder brief): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (100 TB):
  *  - exact dedup groups on a 128-bit content hash, never on the text
  *    itself — the shuffle carries 16 bytes + ids per row, not documents;
  *  - MinHash/LSH is the shingle→signature→band→bucket-join pattern: the
  *    only shuffles are (a) band-bucket grouping on an 8-byte key and
  *    (b) candidate-pair distinct. Bucket size is capped (`maxBucket`) so
  *    a degenerate key (boilerplate docs) cannot produce a quadratic
  *    pair explosion — the cap drops only buckets where every member is
  *    already near-identical to many others (they remain represented via
  *    other bands);
  *  - exact-Jaccard verification re-joins candidate ids to texts instead
  *    of carrying shingle sets through the shuffle.
  */
object DedupOps {

  // ---- exact ----

  /** Group-by-content-hash summary: one row per distinct text (keyed by
    * md5), with the canonical id = min(doc_id) and the copy count. This
    * is the summary table; [[exactDedupSurvivors]] returns the
    * deduplicated document rows themselves. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("text_md5"))

  /** Exact-dedup survivors: the document rows whose id is the canonical
    * (minimum) id of their content-hash group — mirrors
    * [[minhashDedupSurvivors]] for symmetry. The shuffle carries only
    * (16-byte hash, id); survivors are recovered by a semi join on id. */
  def exactDedupSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val canonical = docs
      .groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(canonical, Seq(idCol), "left_semi")
  }

  /** NORMALIZATION-AWARE exact dedup (the C4 convention: hash the
    * canonical form, not the raw bytes): documents whose texts differ
    * only by case, punctuation, or whitespace runs collapse into one
    * group. Canonical form = lowercase → strip punctuation → collapse
    * whitespace runs to one space → trim; every step is
    * engine-portable regexp arithmetic, so the oracle recomputes the
    * canonical hashes bit-for-bit. Emits per canonical group the
    * keep-first survivor, the copy count, and `n_distinct_raw` — how
    * many RAW content hashes the group folded together (> 1 exactly
    * where canonicalization did work the raw-hash dedup cannot).
    *
    * Scale shape: identical to [[exactDedup]] — one shuffle keyed by
    * the 16-byte canonical hash; the distinct-raw count rides the
    * same exchange as a second md5 column. */
  def canonicalDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val canon = trim(regexp_replace(regexp_replace(lower(col(textCol)),
      "\\p{Punct}", ""), "\\s+", " "))
    docs.groupBy(md5(canon).as("canon_md5"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(md5(col(textCol))).as("n_distinct_raw"))
  }

  // ---- minhash / LSH ----

  val NumPerm = 128
  val Bands = 32 // rows=4 → LSH threshold ≈ (1/32)^(1/4) ≈ 0.42

  private val jaccardCountsUdf = udf((a: String, b: String, shingleN: Int) => {
    val (inter, union) = Hashing.jaccardCounts(
      Hashing.shingleSet(if (a == null) "" else a, shingleN),
      Hashing.shingleSet(if (b == null) "" else b, shingleN))
    (inter.toLong, union.toLong)
  })

  /** Candidate near-duplicate pairs via MinHash LSH banding.
    * Output: (id_a, id_b) with id_a < id_b, distinct.
    *
    * md5Based=true swaps the fnv/mix64 signature for the
    * engine-portable md5 one ([[Hashing.minhashBandsMd5]]) — band keys
    * the DuckDB oracle recomputes bit-for-bit, so oracle and engine
    * test the SAME candidate set (no LSH-recall assumption). Same
    * pattern as [[simhashes]]' md5Based flag. */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerm: Int = NumPerm,
      bands: Int = Bands,
      maxBucket: Int = 64,
      md5Based: Boolean = false): DataFrame = {
    // shingle-less documents (null/whitespace-only text) are excluded:
    // they all share the degenerate all-MaxValue signature and would
    // pair with each other at a meaningless 0/0 jaccard. trim-empty
    // means "no Tok.WS tokens" for these space-separated corpora (both
    // engines' trim strips spaces; the oracle applies the same filter).
    val nonEmpty = graft.util.Par.ensure(docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0))
    val sigs = nonEmpty
      .select(
        col(idCol).as("id"),
        if (md5Based)
          // same native-expression shape as the fnv path (no ScalaUDF
          // boundary); string band keys, oracle-recomputable
          graft.functions.Expressions.minhash_bands_md5(
            col(textCol), numPerm, shingleN, bands).as("bands")
        else
          // native fused expression: shingle → 128-perm sig → band keys
          // in one call, no ScalaUDF boundary (MinHashBandsExpr)
          graft.functions.Expressions.minhash_bands(
            col(textCol), numPerm, shingleN, bands).as("bands"))
    // posexplode_OUTER + null filter: a non-outer generate triggers
    // InferFiltersFromGenerate, which pushes size()/isnotnull copies of
    // the full fused signature expression below the parallelism guard
    // into the single-split scan task (the round-17 shingle-postings
    // pathology; band arrays are never empty here, so rows are
    // identical either way)
    val buckets = sigs
      .select(col("id"),
        posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
      .filter(col("band_key").isNotNull)
      .groupBy(col("band_idx"), col("band_key"))
      .agg(collect_list(col("id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    // pairs within bucket (sorted, i<j), then global distinct
    buckets
      .select(explode(graft.functions.ArrayPairs.orderedPairs(col("members"))).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .distinct()
  }

  /** Candidate pairs from a PRE-COMPUTED signature relation
    * (id, sig: Array[Long]) for one band config — the sweep face of
    * [[minhashCandidates]]: a band-config sweep (q158) computes the
    * per-shingle md5 signature pass ONCE
    * ([[graft.functions.Expressions.minhash_sig_md5]]) and calls this
    * per config; banding is pure column regrouping of the minima
    * (comma-joined decimal, byte-identical to the fused
    * [[graft.datapipe.Hashing.minhashBandsMd5]] keys — the q158
    * oracle's hash compare pins the equivalence). */
  def minhashCandidatesFromSigs(sigs: DataFrame, numPerm: Int, bands: Int,
      maxBucket: Int = 64): DataFrame = {
    val rows = numPerm / bands
    val keys = transform(sequence(lit(0), lit(bands - 1)), band =>
      array_join(transform(
        slice(col("sig"), band * lit(rows) + lit(1), lit(rows)),
        x => x.cast("string")), ","))
    sigs
      .select(col("id"),
        posexplode_outer(keys).as(Seq("band_idx", "band_key")))
      .filter(col("band_key").isNotNull)
      .groupBy(col("band_idx"), col("band_key"))
      .agg(collect_list(col("id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(graft.functions.ArrayPairs.orderedPairs(col("members"))).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .distinct()
  }

  /** ALL band configs of a sweep in ONE pass (round 18, guide §2.4
    * "do fewer shuffles over the same data"): emits (bands, id_a,
    * id_b) — for each config `b` in `bandsList`, exactly the rows
    * [[minhashCandidatesFromSigs]](sigs, numPerm, b, maxBucket) would
    * emit, tagged with `b`. One explode + one bucket aggregation + one
    * distinct instead of a per-config chain: the band keys of every
    * config ride a single Generate (Σ bands rows per doc — the same
    * total volume the sequential sweep shuffled in four separate
    * exchanges), the bucket cap applies per (bands, band_idx,
    * band_key) group, i.e. per config, and the distinct is keyed by
    * (bands, id_a, id_b) — per-config candidate sets are untouched.
    * Byte-equivalence to the per-config path is pinned by
    * `LshSweepSpec`. */
  def minhashCandidatesSweep(sigs: DataFrame, numPerm: Int,
      bandsList: Seq[Int], maxBucket: Int = 64): DataFrame = {
    val perConfig = bandsList.map { b =>
      val rows = numPerm / b
      transform(sequence(lit(0), lit(b - 1)), band =>
        struct(lit(b).as("bands"), band.as("band_idx"),
          array_join(transform(
            slice(col("sig"), band * lit(rows) + lit(1), lit(rows)),
            x => x.cast("string")), ",").as("band_key")))
    }
    sigs
      .select(col("id"), explode_outer(flatten(array(perConfig: _*))).as("bk"))
      .filter(col("bk").isNotNull)
      .select(col("bk.bands").as("bands"), col("bk.band_idx").as("band_idx"),
        col("bk.band_key").as("band_key"), col("id"))
      .groupBy(col("bands"), col("band_idx"), col("band_key"))
      .agg(collect_list(col("id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(col("bands"),
        explode(graft.functions.ArrayPairs.orderedPairs(col("members"))).as("pair"))
      .select(col("bands"), col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with exact n-gram
    * Jaccard ≥ `minJaccard` (this is also the "n-gram Jaccard dedup"
    * operator — candidates from LSH instead of a quadratic self-join).
    *
    * Jaccard is emitted as integer numerator/denominator (n_inter,
    * n_union) — exact, order-insensitive, and engine-portable for the
    * DuckDB oracle; the threshold test inter >= minJaccard*union is the
    * same exact predicate on both engines. */
  def minhashNearDupPairs(
      docs: DataFrame,
      minJaccard: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      md5Based: Boolean = false): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, shingleN,
      md5Based = md5Based)
    val txt = docs.select(col(idCol).as("jid"), col(textCol).as("jtext"))
    cands
      .join(txt, col("id_a") === col("jid")).withColumnRenamed("jtext", "text_a").drop("jid")
      .join(txt, col("id_b") === col("jid")).withColumnRenamed("jtext", "text_b").drop("jid")
      .withColumn("jc", jaccardCountsUdf(col("text_a"), col("text_b"), lit(shingleN)))
      .select(col("id_a"), col("id_b"),
        col("jc._1").as("n_inter"), col("jc._2").as("n_union"))
      .filter(col("n_inter") >= lit(minJaccard) * col("n_union"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Persisted LSH postings index of a corpus: one (band_idx,
    * band_key, id) row per band per document — the table a 100 TB
    * pipeline materializes ONCE (partitioned/bucketed by band_key) so
    * each incoming batch probes postings instead of re-banding the
    * corpus. md5Based=true makes the keys engine-portable (the q75
    * oracle recomputes them). */
  def minhashIndex(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerm: Int = NumPerm,
      bands: Int = Bands,
      md5Based: Boolean = false): DataFrame = {
    val base = graft.util.Par.ensure(docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0))
    base.select(
        col(idCol).as("id"),
        if (md5Based)
          graft.functions.Expressions.minhash_bands_md5(
            col(textCol), numPerm, shingleN, bands).as("bands")
        else
          graft.functions.Expressions.minhash_bands(
            col(textCol), numPerm, shingleN, bands).as("bands"))
      .select(col("id"),
        posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
      .filter(col("band_key").isNotNull)
      .select(col("band_idx"), col("band_key"), col("id"))
  }

  /** INCREMENTAL near-dup pairs: a new batch against an indexed corpus
    * plus within the batch itself — the steady-state shape of dedup at
    * 100 TB (the corpus is never re-banded; each batch's work is
    * proportional to the batch, not the corpus).
    *
    *  - cross candidates: batch band keys joined against the postings
    *    index; degenerate corpus keys (> maxBucket postings — shared
    *    boilerplate) are dropped whole, same cap philosophy as
    *    [[minhashCandidates]];
    *  - intra candidates: standard banding within the batch;
    *  - both verified with exact Jaccard against `allTexts`.
    * Output: (id_a, id_b, n_inter, n_union), id_a < id_b, distinct. */
  def minhashNearDupIncremental(
      newDocs: DataFrame,
      corpusIndex: DataFrame,
      allTexts: DataFrame,
      minJaccard: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      maxBucket: Int = 64,
      md5Based: Boolean = false): DataFrame = {
    val batchBands = minhashIndex(newDocs, idCol, textCol, shingleN,
      md5Based = md5Based)
    val okKeys = corpusIndex.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("band_idx"), col("band_key"))
    val cross = batchBands.as("b")
      .join(corpusIndex.as("c"), Seq("band_idx", "band_key"))
      .join(okKeys, Seq("band_idx", "band_key"), "left_semi")
      .select(least(col("b.id"), col("c.id")).as("id_a"),
        greatest(col("b.id"), col("c.id")).as("id_b"))
      .distinct()
    val intra = minhashCandidates(newDocs, idCol, textCol, shingleN,
      maxBucket = maxBucket, md5Based = md5Based)
    val cands = cross.unionByName(intra).distinct()
    val txt = allTexts.select(col(idCol).as("jid"), col(textCol).as("jtext"))
    cands
      .join(txt, col("id_a") === col("jid")).withColumnRenamed("jtext", "text_a").drop("jid")
      .join(txt, col("id_b") === col("jid")).withColumnRenamed("jtext", "text_b").drop("jid")
      .withColumn("jc", jaccardCountsUdf(col("text_a"), col("text_b"), lit(shingleN)))
      .select(col("id_a"), col("id_b"),
        col("jc._1").as("n_inter"), col("jc._2").as("n_union"))
      .filter(col("n_inter") >= lit(minJaccard) * col("n_union"))
  }

  /** EXACT all-pairs similarity join with prefix filtering (the
    * AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al.
    * WWW'08; distributed formulation per Vernica et al. SIGMOD'10) —
    * every document pair with n-gram Jaccard ≥ num/den, with ZERO
    * false negatives. This is the complement of [[minhashNearDupPairs]]:
    * LSH banding is probabilistic (a borderline pair can land in no
    * shared bucket), so when the dedup contract is "no duplicate
    * survives" — benchmark decontamination, eval-set hygiene, legal
    * takedown sweeps — the exact join is the operator of record, and
    * prefix filtering is what makes it feasible without the quadratic
    * self-join.
    *
    * Why it's complete: J(x,y) ≥ t implies |x∩y| ≥ ⌈t·|x|⌉ (from
    * i/(|x|+|y|−i) ≥ t and |y| ≥ i). Order all shingles by ONE global
    * total order (document-frequency ascending, shingle string as
    * tie-break) and keep each document's first
    * p = |x| − ⌈t·|x|⌉ + 1 shingles as its prefix: a qualifying pair
    * must share a prefix shingle of each side (pigeonhole — if every
    * shared shingle sat outside x's prefix, the overlap would be at
    * most |x| − p = ⌈t·|x|⌉ − 1). So joining prefix postings finds
    * every qualifying pair; exact verification then removes false
    * positives — the result is exactly the threshold join.
    *
    * Why it scales: the frequency-ASCENDING order puts the RAREST
    * shingles in every prefix, so candidate buckets are small by
    * construction — the hot boilerplate shingles that would explode a
    * naive postings self-join are pushed out of the prefixes of all
    * long documents (they remain only where they must for
    * completeness). The length filter den·min ≥ num·max prunes
    * mismatched-size pairs before verification. Worst case (a corpus
    * of n IDENTICAL documents) degenerates to C(n,2) candidates — but
    * those are all true results, i.e. the join is output-bound, which
    * is the best any exact algorithm can do. Plan: one shingle-keyed
    * shuffle for document frequencies, one doc-keyed window for
    * prefix positions, one keyed self-join on prefix shingles, exact
    * verify — no cartesian anywhere.
    *
    * Threshold is the exact rational num/den (default 1/2), so both
    * the length filter and the final predicate den·i ≥ num·(|x|+|y|−i)
    * are pure integer comparisons the oracle replays bit-for-bit.
    * Output: (id_a, id_b, n_inter, n_union), id_a < id_b. */
  def ppjoinExact(
      docs: DataFrame,
      num: Long = 1L,
      den: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val st = shingledPostings(docs, idCol, textCol, shingleN).persist()
    st.count()
    // one global document-frequency pass — the total order every
    // prefix is cut against (df ascending ⇒ prefixes carry the rarest
    // shingles ⇒ small candidate buckets)
    val dfreq = st.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // prefix postings with full-order positions; p = n − ⌈t·n⌉ + 1
    val pos = prefixPostings(st, dfreq, num, den)
    // candidate pairs from shared prefix shingles + length filter +
    // PPJoin position filter (see prefixPostings: overlap from this
    // generating shingle ≤ 1 + min(na − rna, nb − rnb); inter ≥
    // ⌈num(na+nb)/(num+den)⌉ must remain possible)
    val a = pos.select(col("s"), col("id").as("id_a"), col("n").as("na"),
      col("rn").as("rna"))
    val b = pos.select(col("s"), col("id").as("id_b"), col("n").as("nb"),
      col("rn").as("rnb"))
    val cands = a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        lit(den) * least(col("na"), col("nb")) >=
          lit(num) * greatest(col("na"), col("nb")) &&
        lit(num + den) * (lit(1L) +
          least(col("na") - col("rna"), col("nb") - col("rnb"))) >=
          lit(num) * (col("na") + col("nb")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // exact verification (same shingle semantics as the postings)
    val out = verifyPairsExact(cands, docs, idCol, textCol, shingleN,
      num, den)
    val res = out.localCheckpoint(true)
    st.unpersist()
    res
  }

  /** INCREMENTAL [[ppjoinExact]]: a new batch against an indexed
    * corpus, plus within the batch — the steady-state shape of EXACT
    * dedup at 100 TB (the [[minhashNearDupIncremental]] counterpart
    * with a completeness guarantee instead of LSH recall). The corpus
    * persists two relations ONCE: its full shingle postings
    * (bucketed by shingle at scale) and its document-frequency table
    * — the FROZEN global order. Each batch cuts ITS prefixes under
    * the frozen order and joins them against corpus-prefix ∪
    * batch-prefix postings; work is ∝ batch, the corpus is never
    * re-shingled.
    *
    * Correctness under staleness, the key design fact: the prefix
    * pigeonhole argument needs only that BOTH sides' prefixes were
    * cut under ONE consistent total order — ANY total order. So the
    * frozen corpus df (with unseen batch shingles ordered first,
    * df = 0: a shingle the corpus never saw is by definition rare)
    * keeps the join EXACT forever; df drift degrades only the
    * candidate-set size, never completeness, and a periodic order
    * refresh is an optimization with no correctness window. Output:
    * every pair (id_a < id_b, n_inter, n_union) with Jaccard ≥
    * num/den where at least one side is in the batch. */
  /** (id, n, s) shingle postings of non-empty docs — the relation
    * both ppjoin faces and the streaming index build from.
    *
    * Implementation note (round-17 measurement): the previous
    * `select(sh).filter(size(sh)>0).select(size(sh), explode(sh))`
    * shape cost ~4 s at sf0.1 for a ~0.3 s expression because (a) the
    * post-Generate `size(sh)` projection forced Generate to RETAIN the
    * whole shingle array per OUTPUT row (~1.5 KB row-copy × every
    * posting), and (b) `InferFiltersFromGenerate` pushed
    * `size(sh)>0 AND isnotnull(sh)` below the repartition Exchange, so
    * the full shingle expression also ran twice inside the
    * single-split scan task. One Scala call per row producing (n, s)
    * structs — [[Hashing.shingleStrings]] is the spec-pinned twin of
    * [[Contamination.shingles]] — evaluates the tokenize+shingle work
    * exactly once per doc and explodes without carrying the array. */
  private[graft] def shingledPostings(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame = {
    val postings = udf((t: String) => {
      val a = Hashing.shingleStrings(if (t == null) "" else t, shingleN)
      val m = a.length.toLong
      a.map(s => (m, s))
    })
    graft.util.Par.ensure(df
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0))
      .select(col(idCol).as("id"), explode(postings(col(textCol))).as("e"))
      .select(col("id"), col("e._1").as("n"), col("e._2").as("s"))
  }

  /** Prefix postings of `st` under the (frozen) `dfreq` order —
    * unseen shingles order FIRST (df 0: corpus-unseen ⇒ rare). A
    * doc's prefix under a frozen order never changes, which is what
    * makes the streaming index append-only.
    *
    * Also emits `rn` — the shingle's 1-based rank within the doc's
    * FULL frozen order — so candidate generation can apply the PPJoin
    * POSITION filter (Xiao et al. WWW'08): for the globally-smallest
    * shared shingle of a qualifying pair, every shared shingle ranks
    * ≥ its positions in both docs, so overlap ≤ 1 + min(n_a − rn_a,
    * n_b − rn_b); a pair is kept iff ANY generating shingle passes
    * that bound, which the smallest shared shingle always does —
    * completeness unchanged, candidate volume cut before the distinct
    * and verify stages. Persisted-store callers that only need the
    * pigeonhole join may project `rn` away (the streaming index does,
    * keeping its on-disk layout). */
  private[graft] def prefixPostings(st: DataFrame, dfreq: DataFrame,
      num: Long, den: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    st.join(dfreq, Seq("s"), "left")
      .withColumn("dfo", coalesce(col("df"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("dfo"), col("s"))).cast("long"))
      .filter(col("rn") <=
        col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1L)
      .select(col("s"), col("id"), col("n"), col("rn"))
  }

  /** Exact verify of candidate pairs (id_a, id_b) against per-doc
    * SORTED shingle-hash arrays: one [[Hashing.shingleSet]] call per
    * DOC (not per pair), candidates join the (id, hashes) relation —
    * dictionary-sized next to the pair volume — and the per-pair work
    * is a codegen'd primitive merge (JaccardPackExpr). Bit-identical
    * to the previous per-pair `jaccardCountsUdf(text_a, text_b)`,
    * which re-tokenized and re-shingled both texts for every
    * candidate (measured: the majority of q157's verify stage).
    * Output: (id_a, id_b, n_inter, n_union) filtered to
    * den·n_inter ≥ num·n_union. */
  private def verifyPairsExact(cands: DataFrame, texts: DataFrame,
      idCol: String, textCol: String, shingleN: Int,
      num: Long, den: Long): DataFrame = {
    val hashArr = udf((t: String) =>
      Hashing.shingleSet(if (t == null) "" else t, shingleN))
    val hashes = texts
      .select(col(idCol).as("jid"), hashArr(col(textCol)).as("jh"))
    cands
      .join(hashes, col("id_a") === col("jid"))
      .withColumnRenamed("jh", "h_a").drop("jid")
      .join(hashes, col("id_b") === col("jid"))
      .withColumnRenamed("jh", "h_b").drop("jid")
      .withColumn("jc",
        graft.functions.Expressions.jaccard_pack(col("h_a"), col("h_b")))
      .select(col("id_a"), col("id_b"),
        shiftrightunsigned(col("jc"), 32).as("n_inter"),
        col("jc").bitwiseAND(lit(0xffffffffL)).as("n_union"))
      .filter(lit(den) * col("n_inter") >= lit(num) * col("n_union"))
  }

  /** The indexed incremental core: batch prefix postings joined
    * against (PERSISTED corpus prefix postings) ∪ themselves, exact
    * verify against the (corpus ∪ batch) text store — every input
    * except the batch is a stored relation, so per-batch compute is
    * ∝ batch + candidate output (the corpus is never re-shingled;
    * the verify join touches only candidate partners). This is the
    * face the streaming state machine calls; [[ppjoinIncremental]]
    * builds the index relations inline for the one-shot q162 form. */
  def ppjoinIncrementalIndexed(
      corpusPre: DataFrame,
      allTexts: DataFrame,
      batch: DataFrame,
      dfreq: DataFrame,
      num: Long = 1L,
      den: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val batchSt = shingledPostings(batch, idCol, textCol, shingleN).persist()
    batchSt.count()
    val batchPre = prefixPostings(batchSt, dfreq, num, den).persist()
    batchPre.count()
    // a PERSISTED corpus prefix store may predate the rn column (the
    // streaming index deliberately stores (s, id, n) only) — pairs
    // whose corpus side lacks rn skip the position filter (coalesce
    // keeps them), which affects candidate volume only, never the
    // verified result
    val corpusPreRn =
      if (corpusPre.columns.contains("rn")) corpusPre
      else corpusPre.withColumn("rn", lit(null).cast("long"))
    val allPre = corpusPreRn.select(col("s"), col("id"), col("n"), col("rn"))
      .unionByName(batchPre)
    val a = batchPre.select(col("s"), col("id").as("id_x"),
      col("n").as("nx"), col("rn").as("rnx"))
    val b = allPre.select(col("s"), col("id").as("id_y"),
      col("n").as("ny"), col("rn").as("rny"))
    val cands = a.join(b, Seq("s"))
      .filter(col("id_x") =!= col("id_y") &&
        lit(den) * least(col("nx"), col("ny")) >=
          lit(num) * greatest(col("nx"), col("ny")) &&
        coalesce(lit(num + den) * (lit(1L) +
            least(col("nx") - col("rnx"), col("ny") - col("rny"))) >=
            lit(num) * (col("nx") + col("ny")), lit(true)))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    val out = verifyPairsExact(cands, allTexts, idCol, textCol, shingleN,
      num, den)
    val res = out.localCheckpoint(true)
    batchSt.unpersist(); batchPre.unpersist()
    res
  }

  def ppjoinIncremental(
      corpus: DataFrame,
      batch: DataFrame,
      num: Long = 1L,
      den: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad threshold $num/$den")
    val corpusSt = shingledPostings(corpus, idCol, textCol, shingleN).persist()
    corpusSt.count()
    // the frozen order: corpus document frequencies, persisted with
    // the index in production; batch-only shingles order first (df 0)
    val dfreq = corpusSt.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    val corpusPre = prefixPostings(corpusSt, dfreq, num, den)
    val txt = corpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    val res = ppjoinIncrementalIndexed(corpusPre, txt, batch, dfreq,
      num, den, idCol, textCol, shingleN)
    corpusSt.unpersist()
    res
  }

  /** Connected-component style dedup: keep the min id of each near-dup
    * cluster (single-pass union via smallest-neighbor — documents whose
    * id equals the cluster min survive). For full transitive closure at
    * scale, iterate `largeStarSmallStar` (documented; one pass suffices
    * for pairwise-similar clusters). */
  def minhashDedupSurvivors(docs: DataFrame, minJaccard: Double,
      md5Based: Boolean = false): DataFrame = {
    val pairs = minhashNearDupPairs(docs, minJaccard, md5Based = md5Based)
    val dropped = pairs.select(col("id_b").as("doc_id")).distinct()
    docs.join(dropped, Seq("doc_id"), "left_anti")
  }

  // ---- simhash ----

  /** doc_id → 64-bit simhash (native codegen expression, Expressions.scala).
    * md5Based=true uses the engine-portable md5-derived token hash
    * (recomputable by the DuckDB oracle); false keeps the cheaper
    * FNV-based hash for pure-throughput paths. */
  def simhashes(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      md5Based: Boolean = false): DataFrame = {
    val expr =
      if (md5Based) graft.functions.Expressions.simhash64_md5(col(textCol))
      else graft.functions.Expressions.simhash64(col(textCol))
    // no Par.ensure here: measured at sf0.1, the simhash expression is
    // cheaper than the repartition shuffle it would take to spread a
    // single-split scan (unlike the 128-permutation minhash signatures)
    docs.select(col(idCol).as("id"), expr.as("simhash"))
  }

  /** All hamming ≤ maxHamming pairs within one block bucket, by
    * recursive pigeonhole over the remaining bit positions: a pair
    * within distance k has ≤ k differing bits spread over any k+1
    * disjoint position groups, so it agrees on ≥ 1 group at EVERY
    * recursion level — completeness holds all the way down. Buckets
    * small enough (or out of splittable bits) fall back to an exact
    * O(m²) popcount scan; only clusters of genuinely near-identical
    * hashes ever reach the quadratic leaf, and their pair volume is
    * inherent to the output, not a blowup. This replaces a lossy
    * maxBucket cap (which silently dropped pairs once a block value
    * concentrated > cap members — measured at 10× data). */
  private[datapipe] def bucketPairsRecursive(
      ids: Array[Long], shs: Array[Long], positions: Array[Int],
      maxHamming: Int,
      out: scala.collection.mutable.HashSet[(Long, Long, Long)]): Unit = {
    val n = ids.length
    if (n < 2) return
    if (n <= 64 || positions.length < maxHamming + 1) {
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val h = java.lang.Long.bitCount(shs(i) ^ shs(j))
          if (h <= maxHamming && ids(i) != ids(j)) {
            val a = math.min(ids(i), ids(j))
            val b = math.max(ids(i), ids(j))
            out += ((a, b, h.toLong))
          }
          j += 1
        }
        i += 1
      }
    } else {
      val groups = maxHamming + 1
      val per = positions.length / groups
      var g = 0
      while (g < groups) {
        val from = g * per
        val until = if (g == groups - 1) positions.length else (g + 1) * per
        val rest = new Array[Int](positions.length - (until - from))
        System.arraycopy(positions, 0, rest, 0, from)
        System.arraycopy(positions, until, rest, from, positions.length - until)
        val byVal = scala.collection.mutable.HashMap
          .empty[Long, (scala.collection.mutable.ArrayBuffer[Long], scala.collection.mutable.ArrayBuffer[Long])]
        var m = 0
        while (m < n) {
          var key = 0L
          var p = from
          while (p < until) {
            key = (key << 1) | ((shs(m) >>> positions(p)) & 1L)
            p += 1
          }
          val e = byVal.getOrElseUpdate(key,
            (scala.collection.mutable.ArrayBuffer.empty[Long],
              scala.collection.mutable.ArrayBuffer.empty[Long]))
          e._1 += ids(m)
          e._2 += shs(m)
          m += 1
        }
        byVal.valuesIterator.foreach { case (subIds, subShs) =>
          if (subIds.length >= 2)
            bucketPairsRecursive(subIds.toArray, subShs.toArray, rest, maxHamming, out)
        }
        g += 1
      }
    }
  }

  /** Near-dup pairs with Hamming distance ≤ maxHamming, found by the
    * (maxHamming+1)-block pigeonhole trick: any pair within distance k
    * agrees exactly on ≥ 1 of k+1 disjoint blocks, so block-equality
    * buckets are a complete candidate set.
    *
    * Blocking runs over DISTINCT simhashes, not document rows:
    *  1. group ids per simhash (one shuffle) — a corpus of mass
    *     duplicates collapses to one row per distinct hash, so the
    *     degenerate "everyone shares a block value" bucket holds 8-byte
    *     hashes, not member structs;
    *  2. identical-hash groups emit their internal pairs directly
    *     (hamming 0);
    *  3. distinct-hash buckets produce (hash_a, hash_b, hamming) pairs
    *     via [[bucketPairsRecursive]] — exact at any bucket size — then
    *     expand to id pairs by joining each side's id group back.
    * The shuffle carries only true pairs; pair volume for duplicate-
    * heavy corpora is inherent to the output (use exactDedup first when
    * identical content should collapse instead of pairing). */
  def simhashNearDupPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      md5Based: Boolean = false): DataFrame = {
    // null-text docs have a null simhash: drop them (the oracle's sim
    // CTE filters them identically); token-less non-null docs keep
    // simhash 0 on both engines
    val sh = simhashes(docs, idCol, textCol, md5Based)
      .filter(col("simhash").isNotNull)
    hammingNearDupPairs(sh, maxHamming)
  }

  /** Hash-agnostic core of [[simhashNearDupPairs]]: all (id_a, id_b,
    * hamming ≤ maxHamming) pairs over a `(id, simhash)` relation of
    * 64-bit hashes — simhash, perceptual dHash ([[Perceptual]]), or
    * any other hamming-space fingerprint. Same exact pigeonhole
    * blocking, shared so every hamming-space family gets the
    * no-all-pairs scale shape for free. */
  def hammingNearDupPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31, s"maxHamming out of range: $maxHamming")
    val blocks = maxHamming + 1
    val width = 64 / blocks
    // 1L << 64 wraps to 1 in JVM shift semantics; width==64 needs -1L
    val mask = if (width == 64) -1L else (1L << width) - 1
    val groups = sh.groupBy(col("simhash")).agg(collect_list(col("id")).as("ids"))

    // 1) intra-group: identical simhash ⇒ hamming 0
    val intra = groups
      .filter(size(col("ids")) >= 2)
      .select(explode(graft.functions.ArrayPairs.orderedPairs(col("ids"))).as("pr"))
      .select(col("pr._1").as("id_a"), col("pr._2").as("id_b"), lit(0L).as("hamming"))

    // 2) inter-group: pigeonhole blocking over the distinct hashes
    val withBlocks = groups.select(col("simhash"),
      explode(expr(
        s"transform(sequence(0, ${blocks - 1}), b -> named_struct('block_idx', b, 'block_val', (simhash >> (b * $width)) & $mask))"
      )).as("blk"))
    val hashPairsUdf = udf((blockIdx: Int, hs: Seq[Long]) => {
      val arr = hs.toArray
      val lo = blockIdx * width
      val hi = math.min(64, lo + width)
      val positions = (0 until 64).filter(p => p < lo || p >= hi).toArray
      val out = scala.collection.mutable.HashSet.empty[(Long, Long, Long)]
      // hashes are distinct here, so the "id" IS the hash; pairs come
      // back (min, max, hamming ≥ 1)
      bucketPairsRecursive(arr, arr, positions, maxHamming, out)
      out.toSeq
    })
    val hashPairs = withBlocks
      .select(col("simhash"),
        col("blk.block_idx").as("block_idx"), col("blk.block_val").as("block_val"))
      .groupBy(col("block_idx"), col("block_val"))
      .agg(collect_list(col("simhash")).as("hashes"))
      .filter(size(col("hashes")) >= 2)
      .select(explode(hashPairsUdf(col("block_idx"), col("hashes"))).as("p"))
      .select(col("p._1").as("sh_a"), col("p._2").as("sh_b"), col("p._3").as("hamming"))
      .distinct()

    // 3) expand distinct-hash pairs to id pairs (groups are disjoint, so
    // each id pair arises exactly once; normalize orientation)
    val ga = groups.select(col("simhash").as("sh_a"), col("ids").as("ids_a"))
    val gb = groups.select(col("simhash").as("sh_b"), col("ids").as("ids_b"))
    val inter = hashPairs
      .join(ga, Seq("sh_a"))
      .join(gb, Seq("sh_b"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("hamming"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("hamming"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))

    intra.unionByName(inter).orderBy(col("id_a"), col("id_b"))
  }

  // ---- fingerprinting ----

  private val winnowUdf = udf((text: String, n: Int, w: Int) =>
    Hashing.winnow(if (text == null) "" else text, n, w))

  /** Winnowing fingerprints per doc (rolling-hash min-sampling),
    * fingerprint set as an array column — the fast in-engine form. */
  def fingerprints(docs: DataFrame, shingleN: Int = 4, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      winnowUdf(col(textCol), lit(shingleN), lit(window)).as("fingerprint"))

  private val winnowHexUdf = udf((text: String, n: Int, w: Int) =>
    Hashing.winnowMd5Hex(if (text == null) "" else text, n, w))

  /** Winnowing fingerprints as exploded scalar rows (doc_id, fp) with
    * md5-hex shingle hashes — engine-portable (the DuckDB oracle
    * recomputes the identical fingerprints) and array-free for the
    * driver's row-sorted compare. */
  def fingerprintRows(docs: DataFrame, shingleN: Int = 4, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      explode(winnowHexUdf(col(textCol), lit(shingleN), lit(window))).as("fp"))
      .orderBy(col(idCol), col("fp"))
}
