package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Curation funnel stage semantics on a corpus with known planted
  * cases: wrong-lang, too-short, near-duplicate, and clean docs. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val longText = (1 to 40).map(i => s"word$i").mkString(" ")

  def corpus = {
    import spark.implicits._
    Seq(
      (1L, longText, "en", "s", longText.length.toLong),              // clean
      (2L, longText + " tail", "en", "s", longText.length + 5L),     // near-dup of 1 → dropped (id 1 survives)
      (3L, "short text", "en", "s", 10L),                            // fails minTokens
      (4L, longText.replace("word", "mot"), "fr", "s", 100L),        // wrong lang
      (5L, (41 to 80).map(i => s"item$i").mkString(" "), "en", "s", 100L) // clean, distinct
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("each stage drops exactly the planted failures") {
    val out = Curation.curate(corpus, sampleFraction = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 5L), s"got $out")
  }

  test("sample stage subsets the curated set deterministically") {
    val full = Curation.curate(corpus, sampleFraction = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = Curation.curate(corpus, sampleFraction = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(full))
    val half2 = Curation.curate(corpus, sampleFraction = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half == half2)
  }

  test("output keeps all original columns") {
    assert(Curation.curate(corpus).columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }
}
