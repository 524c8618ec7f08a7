package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.Log2FixedExpr

/** [[Unigram]] (q160/q161). */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("viterbi picks the maximum-likelihood split") {
    // "ab" much cheaper than a+b → one piece; "cd" absent → chars
    val scores = Map("a" -> -300000L, "b" -> -300000L, "ab" -> -100000L,
      "c" -> -50000L, "d" -> -50000L)
    assert(Unigram.viterbi("ab", scores).toSeq == Seq("ab"))
    assert(Unigram.viterbi("cd", scores).toSeq == Seq("c", "d"))
    assert(Unigram.viterbi("abab", scores).toSeq == Seq("ab", "ab"))
  }

  test("ties break toward the shortest last piece (smallest k)") {
    // score(xy) == score(x)+score(y): both splits score −200000 —
    // the pinned order keeps k=1 (last piece 'y')
    val scores = Map("x" -> -100000L, "y" -> -100000L, "xy" -> -200000L)
    assert(Unigram.viterbi("xy", scores).toSeq == Seq("x", "y"))
  }

  test("words longer than MaxWordLen are rejected loudly") {
    val scores = ('a' to 'z').map(c => c.toString -> -100000L).toMap
    intercept[IllegalArgumentException] {
      Unigram.viterbi("a" * (Unigram.MaxWordLen + 1), scores)
    }
  }

  test("prune: alphabet kept, usage redistributes, artifact self-consistent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banana bandana ban and anna banana and bandana"),
      (2L, "banana and anna and ban ban ban"),
      (3L, "qzj")).toDF("doc_id", "text")
    val hist = Bpe.wordHistogram(docs, "text")
    val full = Unigram.train(hist)
    val (sc2, rows) = Unigram.trainPruned(hist, full)
    val pieces = rows.map(_._1).toSet
    // alphabet survives pruning (coverage), incl. the rare qzj chars
    full.vocabRows.map(_._1).filter(_.length == 1)
      .foreach(c => assert(pieces(c), s"alphabet char $c dropped"))
    assert(rows.size <= Unigram.PrunedTopV +
      full.vocabRows.count(_._1.length == 1))
    // self-consistency: score2 = lg(usage2) − lg(Σ usage2)
    val total2 = rows.map(_._2).sum
    def lg(x: Long) = Log2FixedExpr.log2Fixed(x, Unigram.FracBits)
    rows.foreach { case (p, u2, s2) => assert(s2 == lg(u2) - lg(total2), p) }
    // every word still segments under the pruned scores
    hist.select("word").collect().map(_.getString(0))
      .foreach(w => assert(Unigram.viterbi(w, sc2).mkString("") == w))
  }

  test("train: alphabet coverage, artifact self-consistency, encode round-trip") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats"),
      (3L, "a rare qzj token"),
      (4L, "")).toDF("doc_id", "text")
    val model = Unigram.train(Bpe.wordHistogram(docs, "text"))
    val rows = model.vocabRows
    // alphabet ⊆ vocab (q, z, j from the rare token included)
    val pieces = rows.map(_._1).toSet
    assert(Set("q", "z", "j").subsetOf(pieces))
    assert(rows.forall(_._1.length <= Unigram.MaxPiece))
    // artifact self-consistency: score1 = lg(usage1) − lg(Σ usage1)
    val total1 = rows.map(_._4).sum
    def lg(x: Long) = Log2FixedExpr.log2Fixed(x, Unigram.FracBits)
    rows.foreach { case (p, _, _, u1, s1) =>
      assert(s1 == lg(u1) - lg(total1), s"piece $p")
    }
    // encode: piece counts reconstruct each word exactly
    val enc = Unigram.encodeDocs(docs, "doc_id", "text", model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(enc(1L)._1 == 6L) // 6 words
    assert(enc(4L) == ((0L, 0L, "")))
    // concatenating the pieces of doc 1 reproduces its words
    assert(enc(1L)._3.replace(" ", "") ==
      "the cat sat on the mat".replace(" ", ""))
    // viterbi under the final scores is what encode used
    val words = "the cats sat on the mats".split(" ")
    val manual = words.flatMap(w => Unigram.viterbi(w, model.scores))
    assert(enc(2L)._3.split(" ").toSeq == manual.toSeq)
    assert(enc(2L)._2 == manual.length.toLong)
  }
}
