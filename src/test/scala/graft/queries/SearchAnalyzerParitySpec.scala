package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.text.StopWords
import org.apache.spark.sql.functions._

/** Token-level parity of [[SearchFacade.analyzeEnglish]] with the
  * reference's ES `english` analyzer
  * (reference es-mapping/publication.json:782-808: classic tokenizer →
  * icu_normalizer → english_possessive_stemmer → english_stop →
  * english_minimal_stemmer), pinned case-by-case against the mapping's
  * exact tables rather than sampled behavior.
  *
  * Documented deviations (also in the analyzeEnglish scaladoc):
  *  - tokenizer: non-letter/digit split instead of Lucene `classic`
  *    (classic keeps interior apostrophes, dotted acronyms, hostnames);
  *  - icu_normalizer approximated by lower() (differs only on
  *    non-ASCII compatibility characters, e.g. ligatures).
  */
class SearchAnalyzerParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val mappingPath = "/root/reference/es-mapping/publication.json"

  test("stopword resource equals the mapping's english_stop table verbatim") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(mappingPath))
    val node = root.path("settings").path("analysis").path("filter")
      .path("english_stop").path("stopwords")
    assert(node.isArray, s"no english_stop.stopwords array in $mappingPath")
    val fromMapping = (0 until node.size).map(node.get(_).asText()).toSet
    assert(fromMapping.size == 768, fromMapping.size)
    assert(StopWords.esEnglish == fromMapping,
      s"missing=${(fromMapping -- StopWords.esEnglish).take(5)} " +
        s"extra=${(StopWords.esEnglish -- fromMapping).take(5)}")
  }

  test("analyzer filter chain in the mapping is what we mirror") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(mappingPath))
    val an = root.path("settings").path("analysis").path("analyzer").path("english")
    assert(an.path("tokenizer").asText() == "classic")
    val filters = (0 until an.path("filter").size)
      .map(an.path("filter").get(_).asText())
    assert(filters == Seq("icu_normalizer", "english_possessive_stemmer",
      "english_stop", "english_minimal_stemmer"), filters)
  }

  test("minimal_english stemmer: Lucene EnglishMinimalStemmer rule-for-rule") {
    // expected values are Lucene's actual outputs, including the
    // quirks (classes→classe, boxes→boxe, gas→ga, species→specy)
    val cases = Seq(
      // len < 3 or no trailing s: unchanged
      "a" -> "a", "as" -> "as", "is" -> "is", "cat" -> "cat",
      // -us / -ss kept
      "virus" -> "virus", "consensus" -> "consensus",
      "class" -> "class", "press" -> "press",
      // -ies → -y when len > 3 and char before 'ies' not a/e
      "ties" -> "ty", "studies" -> "study", "species" -> "specy",
      "queries" -> "query", "bodies" -> "body",
      // -ies kept when preceded by a/e, or the bare token 'ies'
      "ies" -> "ies",
      // -[iaoe]es kept
      "goes" -> "goes", "shoes" -> "shoes", "sees" -> "sees",
      "dies" -> "dy", // len 4: the ies→y rule fires ('d' is not a/e)
      // everything else: drop the final s (including after 'e' when
      // the preceding char is not i/a/o/e — the famous quirks)
      "classes" -> "classe", "boxes" -> "boxe", "batches" -> "batche",
      "windows" -> "window", "cells" -> "cell", "genes" -> "gene",
      "gas" -> "ga", "its" -> "it", "kinases" -> "kinase",
      "receptors" -> "receptor", "dishes" -> "dishe",
    )
    for ((in, want) <- cases)
      assert(SearchFacade.minimalEnglishStemStr(in) == want,
        s"$in: got ${SearchFacade.minimalEnglishStemStr(in)}, want $want")
    // and the Column twin agrees on every case
    import spark.implicits._
    val got = cases.map(_._1).zipWithIndex.map(_.swap).toDF("id", "t")
      .withColumn("s", SearchFacade.minimalEnglishStem(col("t")))
      .orderBy("id").select("s").as[String].collect().toSeq
    assert(got == cases.map(_._2), got)
  }

  test("possessive stemmer accepts Lucene's three apostrophe forms") {
    import spark.implicits._
    val texts = Seq("the cell's cycle", "the cell’s cycle",
      "the cell＇s cycle")
    val toks = SearchFacade
      .withSearchTokens(texts.zipWithIndex.map(_.swap).toDF("id", "text"), "text")
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    assert(toks.forall(_ == Seq("cell", "cycle")), toks)
  }

  test("stop filter runs BEFORE minimal stemming, on the exact ES list") {
    // 'does' and 'begin' are in english_stop: removed before stemming
    // could touch them; 'apoptosis' is not a stopword, so the default
    // drop-final-s rule applies (Lucene really yields 'apoptosi')
    val toks = SearchFacade.analyzeQueryTerms("does apoptosis begin")
    assert(toks == Seq("apoptosi"), toks)
    // numbers 0..100 are in the ES list (unlike glasgow's)
    assert(SearchFacade.analyzeQueryTerms("42 patients 7 cohorts") ==
      Seq("patient", "cohort"))
    // 'www' and single letters are ES-stopped
    assert(SearchFacade.analyzeQueryTerms("www x y z gene") == Seq("gene"))
  }

  test("documented deviation: apostrophe stopwords are unreachable tokens") {
    // the mapping stops 'll and 've (classic-tokenizer artifacts); our
    // tokenizer splits at the apostrophe so they can never appear —
    // the surrounding words still analyze correctly
    // the ES list stops "'ll"/"'ve" but NOT bare "ll"/"ve", so the
    // split-off fragments survive here where ES would drop the token —
    // the one token-level divergence the tokenizer deviation causes
    val toks = SearchFacade.analyzeQueryTerms("we'll they've persisted")
    assert(!toks.exists(_.contains("'")))
    assert(toks == Seq("ll", "ve", "persisted"), toks)
  }
}
