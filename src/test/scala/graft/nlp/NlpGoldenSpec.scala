package graft.nlp

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.SvoExtractor.Concept

/** Golden assertions ported from reference tests/text_nlp.py:52-250 —
  * the reference's own correctness spec for NP chunking and SVO
  * concept extraction.
  */
class NlpGoldenSpec extends AnyFunSuite {

  def nps(text: String): Set[String] =
    NounChunker.chunk(text).map(_.text).toSet

  def hasConcept(cs: Seq[Concept], s: String, v: String, o: String): Boolean =
    cs.exists(c => c.subject == s && c.verb == v && c.`object` == o)

  test("asthma sentence noun phrases (text_nlp.py:86-112)") {
    val text = "Asthma is a chronic disease characterized by airway inflammation, obstruction and hyperresponsiveness."
    val expected = Set("chronic disease", "airway inflammation", "obstruction",
      "Asthma", "hyperresponsiveness")
    assert(nps(text) == expected)
  }

  test("asthma sentence concepts (text_nlp.py:95-110)") {
    val text = "Asthma is a chronic disease characterized by airway inflammation, obstruction and hyperresponsiveness."
    val cs = SvoExtractor.extract(text)
    assert(hasConcept(cs, "Asthma", "be", "chronic disease"), cs)
    assert(hasConcept(cs, "Asthma", "be characterized by", "airway inflammation"), cs)
    assert(hasConcept(cs, "Asthma", "be characterized by", "obstruction"), cs)
    assert(hasConcept(cs, "Asthma", "be characterized by", "hyperresponsiveness"), cs)
  }

  test("serum level concepts (text_nlp.py:142-158)") {
    val text = "The serum levels of CA125, CA15.3, and HE4 were significantly higher " +
      "in the TTF-1-positive group than in the TTF-1-negative group (p<0.05)."
    val cs = SvoExtractor.extract(text)
    assert(hasConcept(cs, "serum levels", "be higher", "TTF-1-positive group"), cs)
    assert(hasConcept(cs, "serum levels", "be higher than", "TTF-1-negative group"), cs)
    val n = nps(text)
    assert(n.contains("serum levels"), n)
    assert(n.contains("TTF-1-positive group"), n)
    assert(n.contains("TTF-1-negative group"), n)
  }

  test("Schistosoma concepts (text_nlp.py:192-216)") {
    val text = "Studies have suggested that Schistosoma mansoni infection reduces " +
      "the severity of asthma and prevent atopy."
    val cs = SvoExtractor.extract(text)
    val n = nps(text)
    assert(n.contains("Schistosoma mansoni infection"), n)
    assert(hasConcept(cs, "Schistosoma mansoni infection", "suggest reduces", "asthma") ||
      hasConcept(cs, "Schistosoma mansoni infection", "suggest reduces", "severity"), cs)
    assert(hasConcept(cs, "Schistosoma mansoni infection", "suggest prevent", "atopy"), cs)
  }

  test("Fanconi noun phrases + concepts (text_nlp.py:218-249)") {
    val text = "Fanconi anemia (FA) is a genetic disease characterized by bone " +
      "marrow failure and increased cancer risk."
    val n = nps(text)
    assert(n.contains("Fanconi anemia"), n)
    assert(n.contains("genetic disease"), n)
    assert(n.contains("bone marrow failure"), n)
    val cs = SvoExtractor.extract(text)
    assert(hasConcept(cs, "Fanconi anemia", "be", "genetic disease"), cs)
    assert(hasConcept(cs, "Fanconi anemia", "be characterized by", "bone marrow failure"), cs)
    assert(hasConcept(cs, "Fanconi anemia", "be characterized by", "cancer risk") ||
      hasConcept(cs, "Fanconi anemia", "be characterized by", "increased cancer risk"), cs)
  }

  test("clinical trials concepts (text_nlp.py:114-140)") {
    val text = "Recently, more and more clinical trials have been performed to " +
      "evaluate the effects of anti-interleukin antibodies in eosinophilic asthma."
    val cs = SvoExtractor.extract(text)
    val n = nps(text)
    assert(n.contains("clinical trials"), n)
    assert(n.contains("eosinophilic asthma"), n)
    assert(hasConcept(cs, "clinical trials", "perform evaluate", "effects"), cs)
    assert(hasConcept(cs, "clinical trials", "perform evaluate", "eosinophilic asthma"), cs)
  }

  test("hyphen tokens stay in noun phrases (text_nlp.py:160-168)") {
    val text = "Here we report that the Polo-like kinase PLK1, an essential mitotic " +
      "kinase regulator, is an important downstream effector of c-ABL in " +
      "regulating the growth of cervical cancer."
    val n = nps(text)
    assert(n.contains("Polo-like kinase PLK1"), n)
    assert(n.exists(_.contains("c-ABL")), n)
  }

  test("corpus sanity: top_chunks < chunks on real abstracts (text_nlp.py:417-431)") {
    val lines = scala.io.Source.fromFile(
      "/root/reference/tests/resources/test_abstract_nlp.txt", "UTF-8")
      .getLines().filter(_.trim.nonEmpty).toList
    assert(lines.nonEmpty)
    lines.foreach { abstractText =>
      val norm = graft.text.TextNormalizer.normalize(abstractText)
      val abbrevs = graft.text.AbbreviationFinder.findAsMap(norm)
      val digest = NounChunker.digest(norm, abbrevs, graft.text.StopWords.documentAnalysis)
      assert(digest.topChunks.length < math.max(digest.chunks.length, 1),
        s"top=${digest.topChunks.length} chunks=${digest.chunks.length}")
    }
  }

  test("lemma normalization") {
    assert(SvoExtractor.lemma("is") == "be")
    assert(SvoExtractor.lemma("suggested") == "suggest")
    assert(SvoExtractor.lemma("performed") == "perform")
    assert(SvoExtractor.lemma("identifies") == "identify")
    assert(SvoExtractor.lemma("regulates") == "regulate")
    assert(SvoExtractor.lemma("shown") == "show")
  }
}
