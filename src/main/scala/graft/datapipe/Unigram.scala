package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Log2FixedExpr

/** Unigram-LM subword tokenizer (the SentencePiece family, Kudo
  * 2018): a frequency-seeded piece vocabulary scored as a unigram
  * language model, with words segmented by VITERBI — the
  * maximum-likelihood split under the piece scores — rather than
  * BPE's greedy merge order. This engine's variant is deterministic
  * end-to-end so a second engine can replay it bit-for-bit: seeding
  * is exact weighted substring counting, the EM refinement is ONE
  * Viterbi-EM round (segment under seed scores → count piece usage →
  * re-score → final segmentation), and every score is Q16 fixed-point
  * floored log2 ([[Log2FixedExpr]] — IEEE ln would differ in ULPs
  * across engines, floored integer log2 cannot), so "likelihood" is
  * an exact integer and ties break on a pinned total order (higher
  * score, then shorter last piece).
  *
  * Scale shape (the q90 BPE discipline): every corpus-scale pass is
  * one keyed aggregation over DISTINCT WORDS (the histogram is the
  * only full-corpus shuffle; substring explosion, Viterbi, and usage
  * counting all run per distinct word, weighted by count), and the
  * MODEL is vocabulary-sized (≤ [[SeedTopV]] + alphabet) — it
  * broadcasts to executors as a plain map, the same artifact shape a
  * production tokenizer ships. Driver math only ever touches the
  * model-sized vocab relation (the q137 convention).
  *
  * Bounds, enforced loudly: words longer than [[MaxWordLen]] chars
  * are rejected (the oracle's DP unroll is [[MaxWordLen]] CTEs; real
  * corpora pre-split rare mega-tokens), and score arithmetic needs
  * weighted counts < 2⁴² ([[Log2FixedExpr]]'s domain — at planet
  * scale seed from a bounded sample; scores are scale-free).
  */
object Unigram {

  /** Longest piece considered (chars). */
  val MaxPiece = 4
  /** Longest segmentable word (= the oracle's DP unroll depth). */
  val MaxWordLen = 16
  /** Seed vocabulary size before the mandatory alphabet union. */
  val SeedTopV = 48
  val FracBits = 16

  /** (piece, score_q16) model + the q161 artifact rows
    * (piece, cnt0, score0_q16, usage1, score1_q16), piece-sorted. */
  final case class Model(scores: Map[String, Long],
      vocabRows: Seq[(String, Long, Long, Long, Long)])

  /** Weighted substring counts over the distinct-word histogram:
    * every substring occurrence of length 1..MaxPiece, weighted by
    * the word's corpus count. One explode + one keyed aggregation. */
  def substringCounts(hist: DataFrame): DataFrame =
    hist.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), st ->
           |  transform(sequence(1, least($MaxPiece, length(word) - st + 1)),
           |    ln -> substr(word, st, ln))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("w"))

  /** Maximum-likelihood segmentation of one word under the scores —
    * dp[j] = best dp[j−k] + score(word[j−k..j]); ties keep the
    * SMALLEST k (shortest last piece), the order the oracle mirrors
    * with (score DESC, k ASC). Coverage is guaranteed because the
    * vocabulary contains the corpus alphabet. */
  def viterbi(word: String, scores: Map[String, Long]): Array[String] = {
    val L = word.length
    require(L <= MaxWordLen,
      s"word longer than $MaxWordLen chars: '$word' ($L) — pre-split mega-tokens")
    val neg = Long.MinValue / 4
    val dp = Array.fill(L + 1)(neg)
    val seg = Array.fill[List[String]](L + 1)(Nil)
    dp(0) = 0L
    var j = 1
    while (j <= L) {
      var k = 1
      while (k <= math.min(MaxPiece, j)) {
        val piece = word.substring(j - k, j)
        scores.get(piece) match {
          case Some(s) if dp(j - k) > neg && dp(j - k) + s > dp(j) =>
            dp(j) = dp(j - k) + s
            seg(j) = piece :: seg(j - k)
          case _ => ()
        }
        k += 1
      }
      j += 1
    }
    require(dp(L) > neg, s"unsegmentable word '$word' (alphabet gap?)")
    seg(L).reverse.toArray
  }

  private def segUdf(scores: Map[String, Long]) =
    udf((w: String) => viterbi(w, scores))

  /** Train the model on a corpus word histogram: seed → score →
    * one Viterbi-EM round → re-score. All collects are vocab-sized. */
  def train(hist: DataFrame): Model = {
    val subs = substringCounts(hist).localCheckpoint(true)
    // seed: top-V substrings by (weight desc, piece asc) ∪ alphabet
    val top = subs.orderBy(col("w").desc, col("piece")).limit(SeedTopV)
      .select(col("piece")).collect().map(_.getString(0))
    val alphabet = hist.select(explode(expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
        .as("piece")).distinct().collect().map(_.getString(0))
    val vocab = (top ++ alphabet).distinct.sorted
    // stage-0 scores: log2f(cnt0) − log2f(Σ cnt0) over the vocab
    val spark = hist.sparkSession
    import spark.implicits._
    val cnt0 = subs.join(broadcast(vocab.toSeq.toDF("piece")), "piece")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total0 = cnt0.values.sum
    def lg(x: Long) = Log2FixedExpr.log2Fixed(x, FracBits)
    val score0 = vocab.map(p => p -> (lg(cnt0(p)) - lg(total0))).toMap
    // E-step: segment distinct words under score0, count piece usage
    // weighted by word count (one keyed agg); M-step: add-1 re-score
    val seg1 = hist.select(col("cnt"),
      explode(segUdf(score0)(col("word"))).as("piece"))
    val usage = seg1.groupBy(col("piece")).agg(sum(col("cnt")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val usage1 = vocab.map(p => p -> (usage.getOrElse(p, 0L) + 1L)).toMap
    val total1 = usage1.values.sum
    val score1 = vocab.map(p => p -> (lg(usage1(p)) - lg(total1))).toMap
    Model(score1,
      vocab.toSeq.map(p => (p, cnt0(p), score0(p), usage1(p), score1(p))))
  }

  /** Pruned vocabulary size (before the mandatory alphabet union) —
    * the SentencePiece prune stage: keep the pieces the EM round
    * actually USED, re-segment, re-score. */
  val PrunedTopV = 24

  /** Prune a trained model to its top-[[PrunedTopV]] pieces by EM
    * usage (alphabet always kept — coverage), segment the corpus
    * under the restricted scores, and re-score from the new usage:
    * the third leg of the SentencePiece loop (seed → EM → prune).
    * Dropping a piece forces its words to re-split, so usage mass
    * REDISTRIBUTES — the pruned artifact is not a row-filter of the
    * unpruned one, which is exactly what the oracle's third DP replay
    * certifies. Returns (scores, rows (piece, usage2, score2_q16)).
    * Same work shape as [[train]]: one distinct-word segmentation
    * pass + vocab-sized driver math. */
  def trainPruned(hist: DataFrame, full: Model): (Map[String, Long],
      Seq[(String, Long, Long)]) = {
    val byUsage = full.vocabRows.sortBy { case (p, _, _, u1, _) => (-u1, p) }
    val kept = (byUsage.take(PrunedTopV).map(_._1) ++
      full.vocabRows.map(_._1).filter(_.length == 1)).distinct.sorted
    val s1k = full.scores.filter { case (p, _) => kept.contains(p) }
    val seg = hist.select(col("cnt"),
      explode(segUdf(s1k)(col("word"))).as("piece"))
    val usage = seg.groupBy(col("piece")).agg(sum(col("cnt")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val usage2 = kept.map(p => p -> (usage.getOrElse(p, 0L) + 1L)).toMap
    val total2 = usage2.values.sum
    def lg(x: Long) = Log2FixedExpr.log2Fixed(x, FracBits)
    val score2 = kept.map(p => p -> (lg(usage2(p)) - lg(total2))).toMap
    (score2, kept.map(p => (p, usage2(p), score2(p))))
  }

  /** Per-document encode under a trained model — the q90 dictionary
    * shape: distinct words segment once (Viterbi under the broadcast
    * scores), counts and the reassembled piece text join back onto
    * the positional token stream. Output: (idCol, n_words, n_pieces,
    * piece_text). */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val toks = filter(split(lower(col(textCol)), graft.util.Tok.WS),
      t => t =!= "")
    val withToks = docs.select(col(idCol), toks.as("ts"))
    val tokenPos = withToks
      .select(col(idCol).as("__d"), posexplode(col("ts")).as(Seq("j", "word")))
    val pieces = segUdf(model.scores)(col("word"))
    val enc = withToks.select(explode(col("ts")).as("word")).distinct()
      .select(col("word"), concat_ws(" ", pieces).as("symstr"),
        size(pieces).cast("long").as("n_syms"))
    val perDoc = tokenPos.join(enc, Seq("word"))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_pieces"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("j"),
          col("symstr")))), p => p("symstr"))).as("piece_text"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("__d", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("piece_text"), lit("")).as("piece_text"))
  }

  /** The q161 artifact table as a DataFrame. */
  def vocabTable(s: SparkSession, model: Model): DataFrame = {
    import s.implicits._
    model.vocabRows.toDF("piece", "cnt0", "score0_q16", "usage1", "score1_q16")
  }
}
