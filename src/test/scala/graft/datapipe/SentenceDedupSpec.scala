package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Spans.sentenceDedup]] — sentence-grain keep-first dedup. */
class SentenceDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(texts: (Long, String)*) = {
    import spark.implicits._
    Spans.sentenceDedup(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("corpus-wide keep-first: the first occurrence survives, later ones drop") {
    val r = run(
      1L -> "Unique opening. Subscribe now! More prose here.",
      2L -> "Subscribe now. Something else entirely.")
    assert(r(1L).getAs[Long]("n_sents") == 3L)
    assert(r(1L).getAs[Long]("n_kept") == 3L)
    assert(r(1L).getAs[String]("clean_text") ==
      "unique opening. subscribe now. more prose here")
    // doc 2's "subscribe now" normalizes to the same sentence (case,
    // end punctuation) → removed; its other sentence survives
    assert(r(2L).getAs[Long]("n_dup_sents") == 1L)
    assert(r(2L).getAs[Long]("n_kept") == 1L)
    assert(r(2L).getAs[String]("clean_text") == "something else entirely")
  }

  test("intra-document repeats after the first are removed too") {
    val r = run(1L -> "Buy this. Buy this. Buy this. Done.")(1L)
    assert(r.getAs[Long]("n_sents") == 4L)
    assert(r.getAs[Long]("n_dup_sents") == 3L)
    assert(r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[String]("clean_text") == "buy this. done")
  }

  test("keeper is the minimum (doc, position) pair") {
    val r = run(
      5L -> "Alpha beta. Shared line.",
      3L -> "Shared line. Gamma delta.")
    // doc 3 < doc 5, so doc 3's occurrence is the keeper
    assert(r(3L).getAs[Long]("n_kept") == 2L)
    assert(r(5L).getAs[String]("clean_text") == "alpha beta")
  }

  test("no boundaries means one sentence; empty and null are zeroed") {
    val r = run(1L -> "no punctuation at all here",
      2L -> "", 3L -> null.asInstanceOf[String])
    assert(r(1L).getAs[Long]("n_sents") == 1L)
    assert(r(1L).getAs[String]("clean_text") == "no punctuation at all here")
    for (id <- Seq(2L, 3L)) {
      assert(r(id).getAs[Long]("n_sents") == 0L)
      assert(r(id).getAs[String]("clean_text") == "")
    }
  }

  test("incremental: indexed sentences always lose, batch keeps first among fresh") {
    import spark.implicits._
    val corpus = Seq(900L -> "Old banner line. Archive body.").toDF("doc_id", "text")
    val idx = Spans.sentenceIndex(corpus, "doc_id", "text")
    // batch doc 1 repeats the indexed banner (removed even though its
    // id is SMALLER than the corpus doc's — arrival order wins) and a
    // fresh sentence shared with doc 2 (doc 1 keeps it, doc 2 drops)
    val batch = Seq(
      1L -> "Old banner line. Fresh shared bit. Own content one.",
      2L -> "Fresh shared bit. Own content two.").toDF("doc_id", "text")
    val r = Spans.sentenceDedupIncremental(batch, idx, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_dup_index") == 1L)
    assert(r(1L).getAs[Long]("n_kept") == 2L)
    assert(r(1L).getAs[String]("clean_text") ==
      "fresh shared bit. own content one")
    assert(r(2L).getAs[Long]("n_dup_batch") == 1L)
    assert(r(2L).getAs[String]("clean_text") == "own content two")
  }

  test("incremental with an empty index degenerates to plain keep-first") {
    import spark.implicits._
    val docs = Seq(1L -> "Alpha. Beta.", 2L -> "Beta. Gamma.")
      .toDF("doc_id", "text")
    val emptyIdx = Spans.sentenceIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    val inc = Spans.sentenceDedupIncremental(docs, emptyIdx, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(4), x.getString(5)))
    val base = Spans.sentenceDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(3), x.getString(4)))
    assert(inc.toSeq == base.toSeq)
  }

  test("result is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      i -> s"Common banner here. Body number ${i % 9}. Tail ${i % 4}!")
    val a = Spans.sentenceDedup(docs.toDF("doc_id", "text").repartition(1),
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    val b = Spans.sentenceDedup(docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
