package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * learn a bounded merge table from corpus word frequencies, then
  * encode every document with it — so token-budget operators can
  * budget in REAL learned subword tokens instead of whitespace / char
  * proxies.
  *
  * Scale shape (the Sennrich trainer topology, Spark-first):
  *  - ONE distributed exact word-count shuffle builds the histogram;
  *    each merge round then runs as ONE distributed pair-count
  *    aggregate over the FULL histogram relation (adjacent-symbol
  *    pairs weighted by word count, map-side combined), and the
  *    round's winner is a `TakeOrderedAndProject` of exactly one row
  *    — driver state is one (a, b) pair per round, never a segment
  *    table. Per-round work is ∝ DISTINCT words (the persisted
  *    histogram), never the corpus, so a rare-but-mergeable tail
  *    word counts exactly like a head word.
  *  - Encode is fully DISTRIBUTED and codegen'd, no UDF: a word's
  *    segmentation is a U+0001-delimited symbol string where EVERY
  *    symbol carries its own separator pair (`⟨S⟩a⟨S⟩⟨S⟩b⟨S⟩`…), and
  *    applying merge (a,b) is a literal `replace` of `⟨S⟩a⟨S⟩⟨S⟩b⟨S⟩`
  *    with `⟨S⟩ab⟨S⟩` — string replace's left-to-right
  *    non-overlapping scan IS greedy BPE application. The per-symbol
  *    separator PAIR matters: with a single shared boundary
  *    separator the scan would consume it and the next adjacent
  *    occurrence could not match (replace scans the original string,
  *    not its output), silently diverging from greedy semantics —
  *    spec-pinned on `aaaa`. The whole merge table becomes a chain
  *    of `replace` calls inside one whole-stage-codegen projection.
  *  - Encode cost is ∝ DISTINCT words, not corpus tokens: the chain
  *    runs once per histogram row, then a keyed join fans the
  *    encodings back onto the token stream.
  *
  * Deterministic by construction: exact integer counts and a
  * (count desc, pair asc) merge choice — the merge table is
  * independent of partitioning (spec-pinned at vocab ≥ 1k). The
  * DuckDB oracle replays the identical procedure stage by stage.
  *
  * Deviations from classic BPE, both documented and mirrored in the
  * oracle: no end-of-word marker (merges never cross word
  * boundaries, so the marker only relabels final symbols), and
  * merging stops when no pair reaches corpus weight 2 (a weight-1
  * merge could never recur). Precondition: tokens must not contain
  * U+0001/U+0002 (true of the whitespace-tokenized corpus space).
  */
object Bpe {

  /** Symbol-boundary separator for the delimited segmentation
    * string; U+0002 serves as a never-matching replace pattern when
    * the merge table is exhausted mid-chain (oracle side only). */
  val Sep = "\u0001"

  /** Lowercased whitespace tokens — the corpus token space every
    * text op here shares. */
  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), graft.util.Tok.WS), t => t =!= "")

  /** Exact (word, cnt) histogram — the one corpus-wide shuffle. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right application of one merge to a symbol
    * sequence — exactly the semantics of a non-overlapping string
    * `replace` on the delimited form (the encode path and the DuckDB
    * oracle both use the replace form; this vector twin backs the
    * spec suite's independent driver-local replay of training). */
  private[datapipe] def applyMerge(syms: Vector[String], a: String,
                                   b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Top `r` pairs of one round's (count desc, pair asc) order over a
    * SEGMENTED histogram (`seg` = delimited symbol string, `cnt` =
    * word count): explode adjacent symbol pairs weighted by count,
    * partial-aggregate, keep corpus weight ≥ 2 — a
    * `TakeOrderedAndProject` of ≤ r rows. */
  private def topPairs(segHist: DataFrame, r: Int): Seq[(String, String, Long)] = {
    val syms = filter(split(col("seg"), Sep), x => x =!= "")
    // explode(null) on sub-pair words emits nothing; sequence must
    // be guarded (Spark generates DESCENDING ranges when stop<start)
    segHist
      .select(col("cnt"), syms.as("__sy"))
      .select(col("cnt"), col("__sy"),
        explode(when(size(col("__sy")) >= 2,
          sequence(lit(1), size(col("__sy")) - 1))).as("__i"))
      .select(col("cnt"),
        element_at(col("__sy"), col("__i")).as("a"),
        element_at(col("__sy"), col("__i") + 1).as("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
      .filter(col("n") >= 2L)
      .orderBy(col("n").desc, col("a").asc, col("b").asc)
      .limit(r).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
      .toSeq
  }

  /** Greedy admission of a batch of merges from ONE round's collected
    * top-`requested` pair list, PROVABLY identical to choosing them
    * one sequential round at a time. The admitted set is a prefix of
    * the (count desc, pair asc) order where each pair after the first
    * satisfies, at its admission point (S = symbols of all
    * previously admitted pairs plus their concatenations):
    *
    *  1. DISJOINT — neither of its symbols is in S. Sharing a symbol
    *     means an earlier batch merge changes (or could change) its
    *     count, so its collected count is stale; the concatenations
    *     are in S because a pair whose symbol EQUALS an earlier
    *     merge's output gains occurrences.
    *  2. STRICTLY OUT-COUNTS every possible riser — its count must
    *     exceed (a) the collection cutoff (the last collected count;
    *     0 when the list is complete, i.e. shorter than requested)
    *     and (b) the count of every still-listed non-admitted pair
    *     that interacts with S. Proof sketch: any occurrence of a
    *     pair CREATED (or grown) by the batch's earlier merges maps
    *     injectively onto an original occurrence of a pair sharing a
    *     symbol with S — so every riser is bounded by
    *     max(interactingMax, cutoff), and strict inequality rules
    *     out a tie that the (pair asc) tie-break could resolve
    *     against us. Pairs NOT interacting with S keep their exact
    *     counts, and every such pair above this one in the total
    *     order is already admitted (and consumed to count 0 by its
    *     own merge — greedy replace leaves no residual adjacency of
    *     the merged pair). Hence the sequential trainer, run round
    *     by round, picks exactly this prefix in exactly this order.
    *
    * Admission stops at the first pair that fails either test (a
    * later pair could pass, but a non-prefix admission would break
    * the proof). Worst case — interacting head pairs — degenerates
    * to one merge per round, exactly the sequential trainer. */
  private[datapipe] def admitBatch(top: Seq[(String, String, Long)],
      requested: Int, maxAdmit: Int): Seq[(String, String)] = {
    val cutoff = if (top.size < requested) 0L else top.last._3
    val admitted = collection.mutable.ArrayBuffer.empty[(String, String)]
    val s = collection.mutable.Set.empty[String]
    var stopped = false
    for ((a, b, n) <- top if !stopped && admitted.size < maxAdmit) {
      if (admitted.isEmpty) {
        admitted += ((a, b)); s ++= Seq(a, b, a + b)
      } else if (!s.contains(a) && !s.contains(b)) {
        // admitted pairs are excluded: they contain S symbols by
        // construction but are consumed to count 0 by their own merge
        val interactingMax = top.iterator
          .filter { case (x, y, _) =>
            (s.contains(x) || s.contains(y)) && !admitted.contains((x, y)) }
          .map(_._3).maxOption.getOrElse(0L)
        if (n > math.max(cutoff, interactingMax)) {
          admitted += ((a, b)); s ++= Seq(a, b, a + b)
        } else stopped = true
      } else stopped = true
    }
    admitted.toSeq
  }

  /** Learn up to `numMerges` merges from the FULL (word, cnt)
    * histogram. Returns the ordered merge table — bit-identical to
    * the classic one-merge-per-round trainer (spec-pinned against
    * [[trainRescan]] and the driver-local replay), at a fraction of
    * the rounds and the work:
    *
    *  - INCREMENTAL segmentation: the SEGMENTED histogram (delimited
    *    symbol string + count) is persisted once and each round
    *    applies ONLY that round's admitted merges — literal `replace`s
    *    over the cached relation — instead of re-segmenting every
    *    word under the full chain-so-far (O(M²) total replace work
    *    over M rounds; this shape is O(M)). Function composition makes
    *    the two identical. Each round's result is localCheckpoint'ed
    *    (eager) so lineage — and with it per-round planning cost —
    *    stays constant; the previous round's blocks are then freed.
    *  - ROUND BATCHING: each round collects the top `batchTopK` pairs
    *    (one `TakeOrderedAndProject`, ≤ batchTopK rows to the driver)
    *    and [[admitBatch]] admits the longest prefix that is PROVABLY
    *    what sequential rounds would choose (disjoint symbols +
    *    strict-count dominance over every possible riser — see its
    *    scaladoc for the proof). Diverse vocabularies admit many
    *    merges per round-trip; adversarial ones degenerate to 1 —
    *    never to a wrong table.
    *
    * Per-round work is ∝ DISTINCT words (one cached-relation scan +
    * one pair-count aggregate); driver state is ≤ batchTopK (pair,
    * count) rows per round — no top-K truncation of the HISTOGRAM
    * (every distinct word always counts), no driver-side segment
    * table. At production vocab sizes (32k+ merges) the round count —
    * the M sequential driver round-trips that remained after the
    * incremental fix — drops by the average admitted-batch size. */
  def train(hist: DataFrame, numMerges: Int,
            batchTopK: Int = 64): Seq[(String, String)] = {
    require(numMerges >= 0)
    require(batchTopK >= 1, s"batchTopK must be >= 1: $batchTopK")
    var seg = hist
      .select(regexp_replace(col("word"), "(.)", Sep + "$1" + Sep).as("seg"),
        col("cnt").cast("long").as("cnt"))
      .localCheckpoint(true)
    try {
      val acc = collection.mutable.ArrayBuffer.empty[(String, String)]
      var exhausted = false
      while (acc.size < numMerges && !exhausted) {
        val top = topPairs(seg, batchTopK)
        if (top.isEmpty) exhausted = true
        else {
          val batch = admitBatch(top, batchTopK, numMerges - acc.size)
          acc ++= batch
          if (acc.size < numMerges) {
            val next = seg.select(
              batch.foldLeft(col("seg")) { case (c, (a, b)) =>
                replace(c, lit(Sep + a + Sep + Sep + b + Sep),
                  lit(Sep + a + b + Sep))
              }.as("seg"),
              col("cnt")).localCheckpoint(true)
            seg.unpersist()
            seg = next
          }
        }
      }
      acc.toList
    } finally { seg.unpersist(); () }
  }

  /** The from-scratch trainer the incremental [[train]] must match:
    * each round re-segments every word under the full merge chain so
    * far. Kept as the spec cross-check (provably same output) — not
    * used in any query path. */
  private[datapipe] def trainRescan(hist: DataFrame,
                                    numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0)
    import org.apache.spark.storage.StorageLevel
    val base = hist.select(col("word"), col("cnt").cast("long").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val acc = collection.mutable.ArrayBuffer.empty[(String, String)]
      var k = 0
      var exhausted = false
      while (k < numMerges && !exhausted) {
        val segged = base.select(
          segmentExpr(col("word"), acc.toSeq).as("seg"), col("cnt"))
        topPairs(segged, 1).headOption match {
          case None => exhausted = true
          case Some((a, b, _)) => acc += ((a, b)); k += 1
        }
      }
      acc.toList
    } finally { base.unpersist(); () }
  }

  /** Delimited segmentation string for `wordCol` after applying the
    * whole merge table — a codegen'd chain of literal replaces. */
  def segmentExpr(wordCol: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(
      regexp_replace(wordCol, "(.)", Sep + "$1" + Sep)) {
      case (c, (a, b)) =>
        replace(c, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }

  /** STATELESS per-row encode: (idCol, n_words, n_bpe_tokens,
    * bpe_text) computed entirely inside one projection — the replace
    * chain runs per token occurrence instead of once per distinct
    * word, trading the [[encodeDocs]] dictionary reuse for zero
    * shuffles and zero state. That trade is exactly what a STREAMING
    * encode needs (runs unchanged on a streaming DataFrame, append
    * mode, no state store; spec-pinned equal to [[encodeDocs]]), and
    * is also the right batch shape when the corpus is so wide that
    * the distinct-word relation rivals the corpus itself. */
  def encodePerRow(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val ts = toks(col(textCol))
    val symsOf = (w: Column) =>
      filter(split(segmentExpr(w, merges), Sep), x => x =!= "")
    docs.select(col(idCol),
      size(ts).cast("long").as("n_words"),
      aggregate(transform(ts, w => size(symsOf(w)).cast("long")),
        lit(0L), (acc, x) => acc + x).as("n_bpe_tokens"),
      concat_ws(" ", flatten(transform(ts, w => symsOf(w)))).as("bpe_text"))
  }

  /** Encode every document: (idCol, n_words, n_bpe_tokens, bpe_text)
    * where bpe_text is the space-joined subword stream. Distinct
    * words are encoded once (the replace chain runs per histogram
    * row), then joined back onto the positional token stream. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val withToks = docs.select(col(idCol), toks(col(textCol)).as("ts"))
    val tokenPos = withToks
      .select(col(idCol).as("__d"), posexplode(col("ts")).as(Seq("j", "word")))
    val syms = filter(split(segmentExpr(col("word"), merges), Sep),
      x => x =!= "")
    val enc = withToks.select(explode(col("ts")).as("word")).distinct()
      .select(col("word"), concat_ws(" ", syms).as("symstr"),
        size(syms).cast("long").as("n_syms"))
    val perDoc = tokenPos.join(enc, Seq("word"))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("j"),
          col("symstr")))), p => p("symstr"))).as("bpe_text"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("__d", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("bpe_text"), lit("")).as("bpe_text"))
  }

  /** Positional per-word subword counts: (idCol, j, n_syms) — one row
    * per word OCCURRENCE (j = 0-based position), n_syms = the word's
    * encoded length under `merges`. The [[encodeDocs]] dictionary
    * shape without the text reassembly: distinct words encode once,
    * the counts join back onto the positional stream. This is the
    * relation BPE-budget CHUNKING consumes (a training window is a
    * run of words whose n_syms sum fits the budget). */
  def wordSymCounts(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val withToks = docs.select(col(idCol), toks(col(textCol)).as("ts"))
    val tokenPos = withToks
      .select(col(idCol), posexplode(col("ts")).as(Seq("j", "word")))
    val syms = filter(split(segmentExpr(col("word"), merges), Sep),
      x => x =!= "")
    val enc = withToks.select(explode(col("ts")).as("word")).distinct()
      .select(col("word"), size(syms).cast("long").as("n_syms"))
    tokenPos.join(enc, Seq("word"))
      .select(col(idCol), col("j").cast("long").as("j"), col("n_syms"))
  }
}
