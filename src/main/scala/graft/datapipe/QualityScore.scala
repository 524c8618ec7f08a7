package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Repetition metrics — the Gopher/MassiveText repetition-filter
    * family (Rae et al. 2021 §A1.1: documents dominated by repeated
    * n-grams are boilerplate/spam): per document, total / distinct /
    * max-count word n-gram statistics, integer-exact so the DuckDB
    * oracle recomputes them (q76). Downstream filters derive the
    * published ratios from the ints (dup fraction = (n_grams −
    * n_distinct_grams)/n_grams; top-gram fraction = max_gram_count /
    * n_grams).
    *
    * Scale shape: explode → count per (doc, gram) → per-doc aggregate;
    * two keyed shuffles whose rows are (id, hashed-gram) pairs, the
    * same shape as corpus token counting — no per-row quadratic
    * histogram, no driver state. Docs with fewer than n tokens (or
    * null text) emit zero rows of grams and surface with zeroed
    * metrics via the left join. */
  def repetitionMetrics(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val base = graft.util.Par.ensure(docs).select(col(idCol),
      expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
        .as("__toks"))
    val grams = base
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(__toks) - $n),
           |  i -> concat_ws(' ', slice(__toks, i + 1, $n)))""".stripMargin))
        .as("__gram"))
    val perGram = grams.groupBy(col(idCol), col("__gram"))
      .agg(count(lit(1)).as("__n"))
    val perDoc = perGram.groupBy(col(idCol)).agg(
      sum(col("__n")).as("__total"),
      count(lit(1)).as("__distinct"),
      max(col("__n")).as("__max"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__total"), lit(0L)).as("n_grams"),
        coalesce(col("__distinct"), lit(0L)).as("n_distinct_grams"),
        coalesce(col("__max"), lit(0L)).as("max_gram_count"))
  }

  /** CHARACTER-fraction repetition rules — the second half of the
    * Gopher/MassiveText repetition battery (Rae et al. 2021 §A1.1):
    * where [[repetitionMetrics]] counts GRAMS, the published drop
    * thresholds are stated as fractions of CHARACTERS, which weights a
    * repeated long phrase more than a repeated stopword pair:
    *
    *   - `top{n}_chars` — characters inside occurrences of the single
    *     most frequent word n-gram (count × gram char length, the
    *     published convention — occurrences of ONE gram overlap only
    *     pathologically);
    *   - `dup{m}_chars` — characters covered by at least one
    *     occurrence of ANY duplicated (count ≥ 2 within the doc)
    *     m-gram, overlap-MERGED so each character counts once (the
    *     published "no double counting" convention — here overlap is
    *     the common case: a k-token repeat covers k−m+1 duplicated
    *     m-grams over the same characters).
    *
    * Character space is the whitespace-NORMALIZED document (lowercased
    * tokens joined by single spaces; gram length includes its internal
    * spaces) so the arithmetic is exact and engine-portable — raw-text
    * char offsets would make the metric depend on runs of whitespace
    * that tokenization already erased. Keep flags apply the published
    * Gopher Table A1 threshold FOR THE REQUESTED GRAM SIZE (top-2
    * 0.20, top-3 0.18, top-4 0.16; dup-5 0.15 … dup-10 0.10) as
    * cross-multiplied integer tests; gram sizes outside the published
    * table are rejected eagerly rather than silently scored with the
    * 2/5 thresholds. The raw integers are emitted so downstream
    * re-thresholds without a second scan.
    *
    * Scale shape: positional tokens (one doc-keyed window for char
    * offsets — per-doc partitions, bounded by document length, the
    * [[Packing.chunkByTokenBudget]] contract), per-(doc, gram) counts
    * (map-side-combined), the top gram per doc as one `min(struct)`
    * partial agg (no per-doc sort), and interval-union coverage via a
    * running-max window over each doc's DUPLICATED-gram occurrences
    * only. Every exchange is keyed by doc or (doc, gram); no state
    * outlives a key. */
  def repetitionCharMetrics(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", nTop: Int = 2, nDup: Int = 5): DataFrame = {
    val (topPct, dupPct) = (gopherTopPct(nTop), gopherDupPct(nDup))
    val nLead = math.max(nTop, nDup)
    val base = graft.util.Par.ensure(docs).select(col(idCol),
      expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
        .as("__toks"))
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("__i"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    // one positional pass: char start of token i in the normalized
    // text, plus the nTop/nDup-gram starting at i (null near the end)
    def gram(n: Int): Column =
      when(lead(col("__t"), n - 1).over(wOrd).isNotNull,
        concat_ws(" ", (0 until n).map(k =>
          if (k == 0) col("__t") else lead(col("__t"), k).over(wOrd)): _*))
    val pos = base
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__i", "__t")))
      .select(col(idCol),
        coalesce(sum(length(col("__t")) + 1).over(wCum), lit(0L)).as("__s"),
        length(col("__t")).cast("long").as("__len"),
        gram(nTop).as("__gtop"), gram(nDup).as("__gdup"))
    val nChars = pos.groupBy(col(idCol)).agg(
      (sum(col("__len")) + count(lit(1)) - 1).as("n_chars"))
    // top gram: (count desc, gram asc) via min over (-count, gram)
    val top = pos.filter(col("__gtop").isNotNull)
      .groupBy(col(idCol), col("__gtop")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__c")).as("nc"), col("__gtop").as("g"))).as("__k"))
      .select(col(idCol), (-col("__k.nc")).as("top_count"),
        (-col("__k.nc") * length(col("__k.g"))).as("top_chars"))
    // duplicated nDup-grams: occurrences joined back to in-doc counts,
    // then interval union via running max of span end
    val dupCnt = pos.filter(col("__gdup").isNotNull)
      .groupBy(col(idCol), col("__gdup")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select(col(idCol), col("__gdup"))
    val occ = pos.filter(col("__gdup").isNotNull)
      .join(dupCnt, Seq(idCol, "__gdup"))
      .select(col(idCol), col("__s"),
        (col("__s") + length(col("__gdup")) - 1).as("__e"))
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dup = occ
      .withColumn("__floor",
        greatest(col("__s") - 1, coalesce(max(col("__e")).over(wPrev), lit(-1L))))
      .groupBy(col(idCol))
      .agg(sum(greatest(col("__e") - col("__floor"), lit(0L))).as("dup_chars"))
    val cChars = coalesce(col("n_chars"), lit(0L))
    val cTop = coalesce(col("top_chars"), lit(0L))
    val cDup = coalesce(col("dup_chars"), lit(0L))
    docs.select(col(idCol))
      .join(nChars, Seq(idCol), "left_outer")
      .join(top, Seq(idCol), "left_outer")
      .join(dup, Seq(idCol), "left_outer")
      .select(col(idCol),
        cChars.as("n_chars"),
        coalesce(col("top_count"), lit(0L)).as(s"top${nTop}_count"),
        cTop.as(s"top${nTop}_chars"),
        cDup.as(s"dup${nDup}_chars"),
        when(cTop * 100 <= cChars * topPct && cDup * 100 <= cChars * dupPct,
          1L).otherwise(0L).as("keep_rep"))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, Table A1), as
    * integer percentages of normalized characters: the max fraction
    * covered by the single most frequent n-gram (n = 2..4). Gram
    * sizes outside the published table have no defined keep flag. */
  private[datapipe] def gopherTopPct(n: Int): Int = n match {
    case 2 => 20; case 3 => 18; case 4 => 16
    case _ => throw new IllegalArgumentException(
      s"no published top-$n-gram threshold (Gopher Table A1 covers 2..4)")
  }

  /** Gopher duplicate-n-gram coverage thresholds (Table A1), integer
    * percentages: n = 5..10 map to 15..10. */
  private[datapipe] def gopherDupPct(n: Int): Int = n match {
    case 5 => 15; case 6 => 14; case 7 => 13; case 8 => 12
    case 9 => 11; case 10 => 10
    case _ => throw new IllegalArgumentException(
      s"no published dup-$n-gram threshold (Gopher Table A1 covers 5..10)")
  }

  /** Driver/closure-side twin of [[repetitionCharMetrics]] for one
    * document: (n_chars, top_count, top_chars, dup_chars, keep_rep).
    * Same tokenization, same (count desc, gram asc) top pick, same
    * overlap-merged coverage — the single source of truth for the
    * streaming twin ([[graft.streaming.StreamingPipeline
    * .repetitionCharsStream]]) and its parity spec. */
  def repetitionCharRow(text: String, nTop: Int = 2, nDup: Int = 5):
      (Long, Long, Long, Long, Long) = {
    val (topPct, dupPct) = (gopherTopPct(nTop), gopherDupPct(nDup))
    val toks =
      if (text == null) Array.empty[String]
      else Tok.WsRegex.split(text.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
    val nChars =
      if (toks.isEmpty) 0L else toks.map(_.length.toLong).sum + toks.length - 1
    val starts = new Array[Long](toks.length)
    var off = 0L
    var i = 0
    while (i < toks.length) {
      starts(i) = off; off += toks(i).length + 1; i += 1
    }
    def grams(n: Int): IndexedSeq[(String, Long)] =
      (0 to toks.length - n).map { k =>
        val g = toks.slice(k, k + n).mkString(" ")
        (g, starts(k))
      }
    // top: (count desc, gram asc)
    val topG = grams(nTop)
    val (topCount, topChars) =
      if (topG.isEmpty) (0L, 0L)
      else {
        val byGram = topG.groupBy(_._1).view.mapValues(_.size.toLong)
        val (g, c) = byGram.toSeq.minBy { case (gr, cn) => (-cn, gr) }
        (c, c * g.length)
      }
    // dup coverage: overlap-merged spans of count>1 grams
    val dupG = grams(nDup)
    val dupCounts = dupG.groupBy(_._1).view.mapValues(_.size).toMap
    val spans = dupG.filter(p => dupCounts(p._1) > 1)
      .map { case (g, s) => (s, s + g.length - 1) }.sortBy(identity)
    var covered = 0L
    var prevEnd = -1L
    for ((s, e) <- spans) {
      val floor = math.max(s - 1, prevEnd)
      if (e > floor) covered += e - floor
      if (e > prevEnd) prevEnd = e
    }
    val keep =
      if (topChars * 100 <= nChars * topPct && covered * 100 <= nChars * dupPct)
        1L
      else 0L
    (nChars, topCount, topChars, covered, keep)
  }

  /** Driver/closure-side twin of [[charEntropy]] for one document:
    * (n_cp, ent_nfp, milli_bits_per_char) — same codepoint counting,
    * same Q16 log chain. */
  def charEntropyRow(text: String): (Long, Long, Long) = {
    import graft.functions.Log2FixedExpr.log2Fixed
    if (text == null || text.isEmpty) return (0L, 0L, 0L)
    val counts = new scala.collection.mutable.HashMap[Int, Long]
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      counts(cp) = counts.getOrElse(cp, 0L) + 1L
      i += Character.charCount(cp)
    }
    val n = counts.values.sum
    val ent = n * log2Fixed(n, 16) -
      counts.values.map(c => c * log2Fixed(c, 16)).sum
    (n, ent, ent * 1000 / (n * 65536))
  }

  /** Codepoint-unigram Shannon ENTROPY per document, in exact fixed
    * point — the cheap garbage/binary/low-diversity gate (encrypted or
    * base64 blobs sit near 6 bits/char over a wide alphabet; natural
    * English prose ~4.1; single-char spam near 0). Emitted as the
    * integer pair the identity n·H = n·log2(n) − Σ c·log2(c) makes
    * portable:
    *
    *   - `n_cp`     — codepoints measured;
    *   - `ent_nfp`  — n·H in Q16 ([[graft.functions.Log2FixedExpr]]
    *                  arithmetic, bit-identical in the DuckDB oracle);
    *   - `milli_bits_per_char` — floor(1000·H), the ready-to-threshold
    *                  form (still exact integer division).
    *
    * Scale shape: one (doc, codepoint) partial-agg shuffle (alphabet-
    * bounded per-key state), the log applied per aggregated row —
    * never per character occurrence — and one doc-keyed agg. */
  def charEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.Expressions.log2_fixed
    val fb = 16
    val base = graft.util.Par.ensure(docs)
      .select(col(idCol), col(textCol).as("__t"))
    val counts = base.filter(length(col("__t")) > 0)
      .select(col(idCol), explode(
        expr("transform(sequence(1, length(__t)), i -> substr(__t, i, 1))"))
        .as("__ch"))
      .groupBy(col(idCol), col("__ch")).agg(count(lit(1)).as("__c"))
    val perDoc = counts
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("__n"),
        sum(col("__c") * log2_fixed(col("__c"), fb)).as("__slg"))
      .select(col(idCol), col("__n"),
        (col("__n") * log2_fixed(col("__n"), fb) - col("__slg")).as("__ent"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_cp"),
        coalesce(col("__ent"), lit(0L)).as("ent_nfp"),
        when(col("__n").isNull || col("__n") === 0L, 0L)
          .otherwise(expr(s"(__ent * 1000) DIV (__n * ${1L << fb})"))
          .as("milli_bits_per_char"))
  }

  /** Per-source RANK NORMALIZATION of an integer quality score — the
    * cross-source calibration step before quantile-based filtering
    * ("keep each source's best 30%"): raw scores aren't comparable
    * across sources, ranks are. Emits each row's 1-based rank within
    * its source (order = (score, id) — the id tiebreak makes the rank
    * total and reproducible) plus the source's row count; consumers
    * derive percentile = (rank-1)/(n-1) — the float never crosses an
    * engine boundary.
    *
    * NOT a per-source window (one task per source — the q65 skew
    * trap). The score itself is the band key: per-(source, score)
    * counts cumsum into exclusive offsets — a window over
    * O(nSources · distinct-scores) AGGREGATE rows — and only the
    * within-(source, score) tie-break ranks row data, partitioned by
    * a key that subdivides every source. Integer quality metrics have
    * bounded cardinality (a few thousand distinct values), which
    * bounds the aggregate window; quantize first for continuous
    * scores. */
  def rankNormalize(df: DataFrame, sourceCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val offsets = df
      .groupBy(col(sourceCol).as("__rsrc"), col(scoreCol).as("__rscore"))
      .agg(count(lit(1)).as("__rn"))
      .withColumn("__roffset",
        coalesce(sum(col("__rn")).over(Window.partitionBy(col("__rsrc"))
          .orderBy(col("__rscore"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__rsrc"), col("__rscore"), col("__roffset"))
    val totals = df.groupBy(col(sourceCol).as("__tsrc"))
      .agg(count(lit(1)).as("n_src"))
    df.withColumn("__tie", row_number().over(
        Window.partitionBy(col(sourceCol), col(scoreCol)).orderBy(col(idCol))))
      .join(broadcast(offsets),
        col(sourceCol) === col("__rsrc") && col(scoreCol) === col("__rscore"))
      .join(broadcast(totals), col(sourceCol) === col("__tsrc"))
      .withColumn("src_rank", col("__roffset") + col("__tie"))
      .drop("__tie", "__rsrc", "__rscore", "__roffset", "__tsrc")
  }

  /** Per-doc n-gram NOVELTY vs the whole corpus — the cheap LM-proxy
    * quality/dedup signal (CCNet-family): a document whose bigrams all
    * appear in other documents is boilerplate-like; one whose bigrams
    * are mostly corpus-unique is novel text. df(gram) = number of
    * DISTINCT documents containing the gram; a doc's novel grams are
    * those with df == 1. Integer counts only (no ln-perplexity — ln is
    * not bit-portable across engines; consumers derive ratios).
    *
    * Scale shape: doc-distinct (doc, gram) pairs, gram-keyed df
    * partial agg, one gram-keyed join back, one doc-keyed agg — the
    * vocabulary is never broadcast or collected, and every exchange
    * carries partial-aggregated rows. Same two-gram-shuffle posture as
    * [[repetitionMetrics]]. */
  def ngramNovelty(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val base = graft.util.Par.ensure(docs).select(col(idCol),
      expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
        .as("__toks"))
    val pairs = base
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(__toks) - $n),
           |  i -> concat_ws(' ', slice(__toks, i + 1, $n)))""".stripMargin))
        .as("__gram"))
      .distinct()
    val dfreq = pairs.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
    val perDoc = pairs.join(dfreq, "__gram").groupBy(col(idCol)).agg(
      count(lit(1)).as("__distinct"),
      sum(when(col("__df") === 1, 1L).otherwise(0L)).as("__novel"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__distinct"), lit(0L)).as("n_distinct_grams"),
        coalesce(col("__novel"), lit(0L)).as("n_novel_grams"))
  }

  /** Out-of-vocabulary n-gram rate vs a REFERENCE corpus — the
    * generalization-gap signal: score each document by how many of its
    * n-gram occurrences never appear in the reference slice (typically
    * the train split). A val/test document that is mostly in-vocabulary
    * is "covered" by the training distribution; one that is mostly OOV
    * measures real generalization — and a TRAIN document with high OOV
    * mass against its own split is an outlier worth inspecting. The
    * occurrence-weighted integer counts (`n_grams`, `n_oov_grams`)
    * stay portable; consumers derive the rate.
    *
    * Unlike [[ngramNovelty]] (df within ONE corpus) this is a
    * cross-corpus membership test; unlike [[lmScore]] it asks "seen at
    * all?", not "how probable?" — the cheap first gate before LM
    * scoring.
    *
    * Scale shape: per-(doc, gram) counts (one map-side-combined
    * shuffle), reference vocabulary as a DISTINCT gram relation
    * (∝ reference vocabulary, never collected or broadcast), one
    * gram-keyed left join, one doc agg — the q97/q107 posture. */
  def gramOovScore(docs: DataFrame, refDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    def grams(df: DataFrame, cols: Seq[Column]): DataFrame = {
      val base = graft.util.Par.ensure(df).select(cols :+
        expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
          .as("__toks"): _*)
      base.filter(size(col("__toks")) >= n)
        .select(cols :+ explode(expr(
          s"""transform(sequence(0, size(__toks) - $n),
             |  i -> concat_ws(' ', slice(__toks, i + 1, $n)))""".stripMargin))
          .as("__gram"): _*)
    }
    val perDocGram = grams(docs, Seq(col(idCol)))
      .groupBy(col(idCol), col("__gram")).agg(count(lit(1)).as("__c"))
    val refVocab = grams(refDocs, Seq.empty)
      .select(col("__gram")).distinct().withColumn("__in_ref", lit(1))
    val perDoc = perDocGram
      .join(refVocab, Seq("__gram"), "left_outer")
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("__n"),
        sum(when(col("__in_ref").isNull, col("__c")).otherwise(0L)).as("__oov"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_grams"),
        coalesce(col("__oov"), lit(0L)).as("n_oov_grams"))
  }

  /** Corpus bigram LM FLUENCY score — the perplexity-filter signal of
    * the CCNet family (Wenzek et al. 2020) in exact integer fixed
    * point: score each document by the maximum-likelihood transition
    * probabilities of its bigrams under the LM defined by the corpus
    * itself. P(w2|w1) = c(w1 w2)/c(w1·) is emitted per occurrence as
    * `floor(c_bigram · fp / c_prefix)` (BIGINT division — exact and
    * bit-portable, unlike ln-perplexity) and aggregated per document:
    *
    *   - `n_bigrams`   — transition count (n_tokens − 1 for n ≥ 2);
    *   - `sum_p_fp`    — Σ p_fp over occurrences (mean transition
    *                     probability = sum_p_fp / (n_bigrams · fp):
    *                     high ⇒ typical/fluent text, low ⇒ noise);
    *   - `min_p_fp`    — the weakest transition (a single improbable
    *                     junction flags concatenation/boilerplate
    *                     seams even in an otherwise fluent doc).
    *
    * Unlike [[ngramNovelty]] (distinct-gram document frequency) this
    * weights by OCCURRENCE and by conditional probability, which is
    * what separates "rare but well-formed" from "garbled".
    *
    * Scale shape: per-(doc, gram) counts (one map-side-combined
    * shuffle over hashed-gram-sized rows), a gram-count relation ∝
    * vocabulary² (bounded, sparse), a prefix-count relation ∝
    * vocabulary derived FROM the gram counts (no second pass over
    * occurrences), p_fp computed on the small gram relation and joined
    * back, one doc-keyed agg. The vocabulary is never collected or
    * broadcast; every exchange carries partial-aggregated rows.
    * Overflow bound: c_bigram · fp must stay below 2⁶² (2× headroom
    * under Long.MaxValue), ENFORCED in the plan itself: the p_fp
    * projection guards every gram count with a codegen'd conditional
    * `raise_error` (no extra pass, no driver action — the job fails
    * loudly instead of wrapping silently in non-ANSI mode); shard the
    * corpus above that.
    *
    * Output note: min_p_fp = 0 is ambiguous on its own — it means
    * BOTH "doc has no bigrams" (the coalesced left-join miss) and
    * "doc has a transition whose floored probability is 0" (cb·fp <
    * cu, possible under high-frequency prefixes); consumers
    * disambiguate via n_bigrams > 0. The streaming twin
    * ([[graft.streaming.StreamingPipeline.lmScoreStream]]) also maps
    * out-of-model grams to 0, so the same rule applies there. */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", fp: Long = 1L << 20): DataFrame = {
    val (perDocGram, gramP) = lmParts(docs, idCol, textCol, fp)
    val perDoc = perDocGram.join(gramP, "__gram").groupBy(col(idCol)).agg(
      sum(col("__c_dg")).as("__n"),
      sum(col("__c_dg") * col("__p_fp")).as("__sum_p"),
      min(col("__p_fp")).as("__min_p"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_bigrams"),
        coalesce(col("__sum_p"), lit(0L)).as("sum_p_fp"),
        coalesce(col("__min_p"), lit(0L)).as("min_p_fp"))
  }

  /** Stupid-backoff TRIGRAM LM scoring of one corpus under another's
    * LM (Brants et al. 2007, "Large Language Models in Machine
    * Translation" — the web-scale backoff scheme that needs no
    * discounting statistics), in exact integer fixed point. Where
    * [[lmScore]] scores a corpus under itself (every bigram seen at
    * least once by construction), this scores `docs` under the LM of
    * `refDocs` — train/eval splits — so the backoff chain actually
    * fires: for each trigram occurrence (w1 w2 w3),
    *
    *   s = c3(w1w2w3)·fp / c2(w1w2)            if the trigram is in ref
    *     | α · c2(w2w3)·fp / c1(w2)            else if the bigram is
    *     | α² · c1(w3)·fp / N                  else if the word is
    *     | 0                                   else (OOV)
    *
    * with α = 0.4 = 2/5 EXACT (score multiplied by 2, denominator by
    * 5 — no float ever), every division a BIGINT floor. Per doc:
    * occurrence count, Σ score, min score, and the tier histogram
    * (n_hit3 / n_bo2 / n_bo1 / n_oov) — the histogram alone is the
    * train→eval coverage card; the scores rank fluency under the
    * train distribution.
    *
    * Scale shape: ref n-gram relations are gram-keyed partial aggs
    * (∝ ref vocabulary, never collected/broadcast by hand — AQE may
    * broadcast small ones); the eval occurrence stream carries five
    * keyed left joins (trigram, both bigrams, two unigrams) — all
    * linear, shuffles on gram keys; N rides a 1-row cross join.
    * Overflow (count·fp ≥ 2⁶⁰·4) is ENFORCED in-plan via conditional
    * raise_error, the [[lmScore]] convention. */
  def backoffLmScore(docs: DataFrame, refDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      fp: Long = 1L << 20): DataFrame = {
    val ref = tokenizedBase(refDocs, textCol)
    def named(df: DataFrame, out: String, c: String) =
      df.select(col("__g").as(out), col("__c").as(c))
    val c1 = named(gramCountsDf(ref, 1), "__w", "__c1")
    val c2 = named(gramCountsDf(ref, 2), "__g2", "__c2")
    val c3 = named(gramCountsDf(ref, 3), "__g3", "__c3")
    val n1 = c1.agg(coalesce(sum(col("__c1")), lit(0L)).as("__n1"))
    backoffLmScoreAgainst(docs, c3, c2, c1, n1, idCol, textCol, fp)
  }

  /** [[backoffLmScore]] under a PRUNED reference LM: the count
    * relations are restricted exactly as [[backoffLmModelPruned]]
    * (count ≥ `minCount`, top-`topK` continuations per prefix, closed
    * under conditioning prefixes) but stay DISTRIBUTED — the batch
    * face of the pruned online scorer, and the path that makes its
    * semantics oracle-checkable. `n` stays the FULL corpus mass, so
    * scores the pruned model resolves are bit-identical to
    * [[backoffLmScore]]'s; pruned grams degrade down the chain. */
  def backoffLmScorePruned(docs: DataFrame, refDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minCount: Long = 2L, topK: Int = 100,
      fp: Long = 1L << 20): DataFrame = {
    val (c3k, c2k, c1k, n1) =
      prunedCountRelations(tokenizedBase(refDocs, textCol), minCount, topK)
    def named(df: DataFrame, out: String, c: String) =
      df.select(col("__g").as(out), col("__c").as(c))
    backoffLmScoreAgainst(docs,
      named(c3k, "__g3", "__c3"), named(c2k, "__g2", "__c2"),
      named(c1k, "__w", "__c1"), n1, idCol, textCol, fp)
  }

  /** The scoring back half shared by the full and pruned batch faces:
    * five keyed left joins of the eval trigram stream against the
    * given count relations. */
  private def backoffLmScoreAgainst(docs: DataFrame, c3: DataFrame,
      c2: DataFrame, c1: DataFrame, n1: DataFrame, idCol: String,
      textCol: String, fp: Long): DataFrame = {
    require(fp > 0, s"fixed-point scale must be positive: $fp")
    def toksOf(df: DataFrame, cols: Seq[Column]) =
      graft.util.Par.ensure(df).select(cols :+
        expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
          .as("__toks"): _*)
    val occ = toksOf(docs, Seq(col(idCol)))
      .filter(size(col("__toks")) >= 3)
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(__toks) - 2), i -> struct(
          |  concat_ws(' ', slice(__toks, i, 3)) AS g3,
          |  concat_ws(' ', slice(__toks, i, 2)) AS g2p,
          |  concat_ws(' ', slice(__toks, i + 1, 2)) AS g2s,
          |  element_at(__toks, i + 1) AS w2,
          |  element_at(__toks, i + 2) AS w3))""".stripMargin)).as("__t"))
      .select(col(idCol), col("__t.g3").as("__g3x"),
        col("__t.g2p").as("__g2px"), col("__t.g2s").as("__g2sx"),
        col("__t.w2").as("__w2x"), col("__t.w3").as("__w3x"))
    val joined = occ
      .join(c3.withColumnRenamed("__g3", "__g3x"), Seq("__g3x"), "left_outer")
      .join(c2.select(col("__g2").as("__g2px"), col("__c2").as("__c2p")),
        Seq("__g2px"), "left_outer")
      .join(c2.select(col("__g2").as("__g2sx"), col("__c2").as("__c2s")),
        Seq("__g2sx"), "left_outer")
      .join(c1.select(col("__w").as("__w2x"), col("__c1").as("__c1w2")),
        Seq("__w2x"), "left_outer")
      .join(c1.select(col("__w").as("__w3x"), col("__c1").as("__c1w3")),
        Seq("__w3x"), "left_outer")
      .crossJoin(broadcast(n1))
    val bound = (1L << 60) / fp
    val scored = joined.select(col(idCol),
      expr(
        s"""CASE WHEN greatest(coalesce(__c3, 0), coalesce(__c2s, 0),
           |               coalesce(__c1w3, 0)) >= $bound
           |  THEN CAST(raise_error(concat(
           |    'backoffLmScore overflow bound exceeded: ref count * fp=$fp',
           |    ' would exceed 2^60 (2^62 incl. the 4x backoff factor)',
           |    ' - shard the corpus')) AS BIGINT)
           |WHEN __c3 IS NOT NULL THEN CAST(__c3 * $fp AS BIGINT) DIV __c2p
           |WHEN __c2s IS NOT NULL
           |  THEN CAST(2 * __c2s * $fp AS BIGINT) DIV (5 * __c1w2)
           |WHEN __c1w3 IS NOT NULL
           |  THEN CAST(4 * __c1w3 * $fp AS BIGINT) DIV (25 * __n1)
           |ELSE 0 END""".stripMargin).as("__s"),
      when(col("__c3").isNotNull, 1L).otherwise(0L).as("__h3"),
      when(col("__c3").isNull && col("__c2s").isNotNull, 1L)
        .otherwise(0L).as("__h2"),
      when(col("__c3").isNull && col("__c2s").isNull &&
        col("__c1w3").isNotNull, 1L).otherwise(0L).as("__h1"),
      when(col("__c3").isNull && col("__c2s").isNull &&
        col("__c1w3").isNull, 1L).otherwise(0L).as("__h0"))
    val perDoc = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("__n"), sum(col("__s")).as("__sum"),
      min(col("__s")).as("__min"), sum(col("__h3")).as("__n3"),
      sum(col("__h2")).as("__n2"), sum(col("__h1")).as("__n1h"),
      sum(col("__h0")).as("__n0"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_trigrams"),
        coalesce(col("__sum"), lit(0L)).as("sum_s_fp"),
        coalesce(col("__min"), lit(0L)).as("min_s_fp"),
        coalesce(col("__n3"), lit(0L)).as("n_hit3"),
        coalesce(col("__n2"), lit(0L)).as("n_bo2"),
        coalesce(col("__n1h"), lit(0L)).as("n_bo1"),
        coalesce(col("__n0"), lit(0L)).as("n_oov"))
  }

  /** The `(gram, count)` relation of the `n`-grams of the tokenized
    * reference corpus (`base` = one `__toks` array column). */
  private def gramCountsDf(base: DataFrame, n: Int): DataFrame = base
    .filter(size(col("__toks")) >= n)
    .select(explode(expr(
      s"""transform(sequence(1, size(__toks) - ${n - 1}),
         |  i -> concat_ws(' ', slice(__toks, i, $n)))""".stripMargin))
      .as("__g"))
    .groupBy(col("__g")).agg(count(lit(1)).as("__c"))

  private def tokenizedBase(refDocs: DataFrame, textCol: String): DataFrame =
    graft.util.Par.ensure(refDocs).select(
      expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
        .as("__toks"))

  /** The trained backoff LM of [[backoffLmScore]] as driver-side
    * artifacts for online scoring
    * ([[graft.streaming.StreamingPipeline.backoffLmScoreStream]]):
    * (trigram counts, bigram counts, unigram counts, total tokens).
    * The collect is ∝ the REFERENCE vocabulary — fine for a curated
    * reference slice; at production vocabulary sizes use
    * [[backoffLmModelPruned]], whose collect is explicitly bounded. */
  def backoffLmModelCollected(refDocs: DataFrame, textCol: String = "text"):
      (Map[String, Long], Map[String, Long], Map[String, Long], Long) = {
    val base = tokenizedBase(refDocs, textCol)
    def cnt(n: Int): Map[String, Long] = gramCountsDf(base, n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c1 = cnt(1)
    (cnt(3), cnt(2), c1, c1.values.sum)
  }

  /** PRUNED driver-side backoff LM: [[backoffLmModelCollected]]'s
    * artifacts restricted to grams with count ≥ `minCount` (the
    * count-cutoff pruning of Brants et al. 2007) and to the top-`topK`
    * continuations per conditioning prefix (count desc, gram asc on
    * ties). Kept counts are the UNPRUNED corpus counts and `n` is the
    * full corpus token mass, so every score the pruned model CAN
    * resolve is bit-identical to the full model's at the same backoff
    * level; a pruned gram degrades through the backoff chain exactly
    * as an unseen gram would (spec-pinned).
    *
    * Closure invariant (enforced by construction): a kept trigram's
    * conditioning bigram (its first two words) survives in the bigram
    * table, and a kept bigram's conditioning unigram survives — so
    * [[backoffLmRow]]'s denominator lookups can never miss. The count
    * cutoffs compose (c1(w1) ≥ c2(w1 w2) ≥ c3(w1 w2 w3)), and the
    * per-prefix caps are re-checked with explicit semi-joins because a
    * prefix can lose ITS OWN top-K race while its extension survives.
    *
    * Size bound: ≤ N/minCount unigrams (Zipf mass bound), ≤ topK
    * bigrams per kept unigram, ≤ topK trigrams per kept bigram — the
    * collect is ≤ (N/minCount)·(1 + topK + topK²) rows worst case and
    * in practice vastly smaller; prune work is distributed (the top-K
    * windows partition by prefix — bounded per-key state, never a
    * global sort). */
  def backoffLmModelPruned(refDocs: DataFrame, textCol: String = "text",
      minCount: Long = 2L, topK: Int = 100):
      (Map[String, Long], Map[String, Long], Map[String, Long], Long) = {
    val (c3k, c2k, c1k, n1) =
      prunedCountRelations(tokenizedBase(refDocs, textCol), minCount, topK)
    def toMap(df: DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (toMap(c3k), toMap(c2k), toMap(c1k), n1.collect()(0).getLong(0))
  }

  /** The pruned `(gram, count)` relations shared by
    * [[backoffLmModelPruned]] (collect) and [[backoffLmScorePruned]]
    * (distributed joins): (c3, c2, c1) each as `(__g, __c)` plus the
    * 1-row FULL-mass `(__n1)`. Eagerly materialized (model-sized)
    * because each level feeds both its closure semi-join and its
    * consumer. */
  private def prunedCountRelations(base: DataFrame, minCount: Long,
      topK: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val c1All = gramCountsDf(base, 1).localCheckpoint(true)
    val n1 = c1All.agg(coalesce(sum(col("__c")), lit(0L)).as("__n1"))
    val c1k = c1All.filter(col("__c") >= minCount).localCheckpoint(true)
    def topPerPrefix(df: DataFrame, prefixWords: Int,
        kept: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("__p"))
        .orderBy(col("__c").desc, col("__g").asc)
      df.filter(col("__c") >= minCount)
        .withColumn("__p", substring_index(col("__g"), " ", prefixWords))
        .join(kept.select(col("__g").as("__p")), Seq("__p"), "left_semi")
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= topK)
        .select(col("__g"), col("__c"))
    }
    val c2k = topPerPrefix(gramCountsDf(base, 2), 1, c1k)
      .localCheckpoint(true)
    // c1All/c1k/c2k each feed TWO consumers (total + closure + score
    // join) and earn their eager materialization; c3k feeds exactly
    // one action in either face, so a checkpoint would be pure cost
    val c3k = topPerPrefix(gramCountsDf(base, 3), 2, c2k)
    (c3k, c2k, c1k, n1)
  }

  /** Driver/closure-side twin of [[backoffLmScore]] for one document
    * against a collected model — the single source of truth for the
    * streaming twin and its parity spec. Returns (n_trigrams,
    * sum_s_fp, min_s_fp, n_hit3, n_bo2, n_bo1, n_oov). */
  def backoffLmRow(text: String, c3: Map[String, Long],
      c2: Map[String, Long], c1: Map[String, Long], n: Long,
      fp: Long = 1L << 20): (Long, Long, Long, Long, Long, Long, Long) = {
    val toks =
      if (text == null) Array.empty[String]
      else Tok.WsRegex.split(text.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
    if (toks.length < 3) return (0L, 0L, 0L, 0L, 0L, 0L, 0L)
    // mirror of the batch plan's raise_error bound: the twins must
    // stay bit-identical OR fail identically — never silently wrap
    val bound = (1L << 60) / fp
    var (cnt, sum, mn) = (0L, 0L, Long.MaxValue)
    var (h3, h2, h1, h0) = (0L, 0L, 0L, 0L)
    var i = 0
    while (i < toks.length - 2) {
      val g3 = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      val g2s = toks(i + 1) + " " + toks(i + 2)
      val gmax = math.max(c3.getOrElse(g3, 0L),
        math.max(c2.getOrElse(g2s, 0L), c1.getOrElse(toks(i + 2), 0L)))
      if (gmax >= bound)
        throw new IllegalStateException(
          s"backoffLmScore overflow bound exceeded: ref count * fp=$fp" +
            " would exceed 2^60 (2^62 incl. the 4x backoff factor)" +
            " - shard the corpus")
      val s = c3.get(g3) match {
        case Some(t) => h3 += 1; t * fp / c2(toks(i) + " " + toks(i + 1))
        case None => c2.get(g2s) match {
          case Some(b) => h2 += 1; 2 * b * fp / (5 * c1(toks(i + 1)))
          case None => c1.get(toks(i + 2)) match {
            case Some(u) => h1 += 1; 4 * u * fp / (25 * n)
            case None => h0 += 1; 0L
          }
        }
      }
      cnt += 1; sum += s; if (s < mn) mn = s
      i += 1
    }
    (cnt, sum, mn, h3, h2, h1, h0)
  }

  /** The trained bigram LM of [[lmScore]] as a standalone (gram,
    * p_fp) relation — the train-offline artifact for online scoring
    * ([[graft.streaming.StreamingPipeline.lmScoreStream]] probes it
    * as a broadcast map, the way cluster scoring consumes batch
    * centroids). */
  def lmGramProbs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", fp: Long = 1L << 20): DataFrame =
    lmParts(docs, idCol, textCol, fp)._2
      .select(col("__gram").as("gram"), col("__p_fp").as("p_fp"))

  /** Shared internals of [[lmScore]]/[[lmGramProbs]]: the per-(doc,
    * gram) occurrence counts and the (gram, p_fp) probability
    * relation. */
  private def lmParts(docs: DataFrame, idCol: String, textCol: String,
      fp: Long): (DataFrame, DataFrame) = {
    require(fp > 0, s"fixed-point scale must be positive: $fp")
    val base = graft.util.Par.ensure(docs).select(col(idCol),
      expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
        .as("__toks"))
    val occ = base
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(expr(
        """transform(sequence(0, size(__toks) - 2),
          |  i -> concat_ws(' ', slice(__toks, i + 1, 2)))""".stripMargin))
        .as("__gram"))
    val perDocGram = occ.groupBy(col(idCol), col("__gram"))
      .agg(count(lit(1)).as("__c_dg"))
    val gramCounts = perDocGram.groupBy(col("__gram"))
      .agg(sum(col("__c_dg")).as("__cb"))
    val prefixCounts = gramCounts
      .groupBy(substring_index(col("__gram"), " ", 1).as("__w1"))
      .agg(sum(col("__cb")).as("__cu"))
    val gramP = gramCounts
      .withColumn("__w1", substring_index(col("__gram"), " ", 1))
      .join(prefixCounts, "__w1")
      .select(col("__gram"),
        // the conditional raise_error makes the scaladoc'd overflow
        // bound an ENFORCED invariant (mirrors MomentsAgg.checkHeadroom)
        expr(
          s"""CASE WHEN __cb < ${(1L << 62) / fp}
             |  THEN CAST(__cb * $fp AS BIGINT) DIV __cu
             |  ELSE CAST(raise_error(concat(
             |    'lmScore overflow bound exceeded: corpus bigram count ',
             |    __cb, ' * fp=$fp would exceed 2^62 - shard the corpus'))
             |    AS BIGINT) END""".stripMargin).as("__p_fp"))
    (perDocGram, gramP)
  }

  /** Gopher quality-RULE battery (Rae et al. 2021 §A1.1): the published
    * per-document keep/drop rules as an integer-exact bitmask. Each
    * rule is a ratio test re-expressed as a cross-multiplied integer
    * comparison, so the whole battery is bit-portable (no float ever
    * crosses an engine boundary) and the oracle recomputes every flag:
    *
    *   - bit 0 — word count in [minWords, maxWords] (published 50..100k);
    *   - bit 1 — mean word length in [3, 10] chars
    *             (3·n ≤ Σlen ≤ 10·n, n > 0);
    *   - bit 2 — symbol-to-word ratio ≤ 0.1 for '#' and '…'
    *             (10·n_symbols ≤ n_words);
    *   - bit 3 — ≥ 80% of words contain an alphabetic character
    *             (5·n_alpha_words ≥ 4·n_words);
    *   - bit 4 — ≥ 2 distinct words from the published required-stopword
    *             list (the, be, to, of, and, that, have, with).
    *
    * The two LINE-based Gopher rules (bullet-start / ellipsis-end line
    * fractions) are deliberately out: this corpus is newline-free, so
    * they would be vacuously true — documented deviation, not an
    * omission. `keep` = all five bits set. Raw counts are emitted next
    * to the mask so downstream filters can re-threshold without a
    * second scan.
    *
    * Scale shape: one narrow projection per row — no shuffle, no UDF,
    * fully whole-stage-codegen'd (the token array is built once per
    * row and shared by the four token-derived counts). Plan-pinned
    * exchange-free by PlanAuditSpec. */
  def gopherRules(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Long = 50L,
      maxWords: Long = 100000L): DataFrame = {
    val req = GopherRequiredStopwords.map(lit)
    val txt = coalesce(col(textCol), lit(""))
    val toks = filter(split(txt, Tok.WS), t => t =!= "")
    val base = docs.select(
      col(idCol),
      size(toks).cast("long").as("n_words"),
      coalesce(aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("sum_word_chars"),
      ((length(txt) - length(regexp_replace(txt, "#", "")))
        + (length(txt)
           - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3)
        .cast("long").as("n_symbols"),
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
        .as("n_alpha_words"),
      size(array_intersect(transform(toks, t => lower(t)), array(req: _*)))
        .cast("long").as("n_req_stopwords"))
    val r0 = col("n_words") >= minWords && col("n_words") <= maxWords
    val r1 = col("n_words") > 0 &&
      lit(3L) * col("n_words") <= col("sum_word_chars") &&
      col("sum_word_chars") <= lit(10L) * col("n_words")
    val r2 = lit(10L) * col("n_symbols") <= col("n_words")
    val r3 = lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words")
    val r4 = col("n_req_stopwords") >= 2L
    base.withColumn("rules_passed",
        when(r0, 1L).otherwise(0L) + when(r1, 2L).otherwise(0L) +
        when(r2, 4L).otherwise(0L) + when(r3, 8L).otherwise(0L) +
        when(r4, 16L).otherwise(0L))
      .withColumn("keep", when(col("rules_passed") === 31L, 1L).otherwise(0L))
  }

  /** Rae et al. 2021's required-stopword list (rule bit 4). */
  val GopherRequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

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
