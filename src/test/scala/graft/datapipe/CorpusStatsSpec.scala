package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[CorpusStats.zipfCard]] — exact-rational Zipf slope. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def card(texts: Seq[String], k: Int = 1000) = {
    import spark.implicits._
    CorpusStats.zipfCard(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), k = k)
      .collect()(0)
  }

  test("an exact count ∝ 1/rank corpus fits slope exactly -1") {
    // counts 12, 6, 4, 3 at ranks 1..4: log2f(c) = log2f(12) −
    // log2f(r) EXACTLY (log2f(2x) = log2f(x) + 2¹⁶ by construction,
    // and log2f(3)'s truncation appears identically on both axes), so
    // the four Q16 points are collinear with slope −1
    val text = Seq.fill(12)("alpha") ++ Seq.fill(6)("beta") ++
      Seq.fill(4)("gamma") ++ Seq.fill(3)("delta")
    val r = card(Seq(text.mkString(" ")))
    assert(r.getAs[Long]("n_vocab") == 4L)
    assert(r.getAs[Long]("n_tokens") == 25L)
    assert(r.getAs[Long]("slope_milli") == -1000L)
    // exact rational: num/den = -1 in Q16 terms
    assert(r.getAs[Long]("slope_num") == -r.getAs[Long]("slope_den"))
  }

  test("a flat corpus has slope zero") {
    val r = card(Seq(Seq.fill(10)("a b c d e").mkString(" ")))
    assert(r.getAs[Long]("slope_num") == 0L)
    assert(r.getAs[Long]("slope_milli") == 0L)
  }

  test("degenerate vocabularies emit zero slope, not a division error") {
    val r = card(Seq("solo solo solo"))
    assert(r.getAs[Long]("n_vocab") == 1L)
    assert(r.getAs[Long]("slope_den") == 0L)
    assert(r.getAs[Long]("slope_milli") == 0L)
  }

  test("head-only fit: k caps the regression, totals stay corpus-wide") {
    val text = Seq.fill(12)("hot") ++ Seq.fill(6)("warm") ++
      Seq.fill(4)("mild") ++ Seq.fill(3)("cool") ++ Seq("x", "y", "z")
    val r = card(Seq(text.mkString(" ")), k = 4)
    assert(r.getAs[Long]("n_fit") == 4L)
    assert(r.getAs[Long]("n_vocab") == 7L)
    assert(r.getAs[Long]("slope_milli") == -1000L)
  }

  test("card is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      i -> Seq.fill((i % 7 + 1).toInt)(s"tok${i % 13}").mkString(" "))
    val a = CorpusStats.zipfCard(docs.toDF("doc_id", "text").repartition(1))
      .collect()(0).toSeq
    val b = CorpusStats.zipfCard(docs.toDF("doc_id", "text").repartition(9))
      .collect()(0).toSeq
    assert(a == b)
  }
}
