package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases from reference tests/text_nlp.py:218-224 plus the
  * Schwartz-Hearst paper's own constraints. */
class AbbreviationFinderSpec extends AnyFunSuite {

  test("FA -> Fanconi anemia (text_nlp.py:223-224)") {
    val text = "Fanconi anemia (FA) is a genetic disease characterized by " +
      "bone marrow failure and increased cancer risk."
    val abbrevs = AbbreviationFinder.findAsMap(text)
    assert(abbrevs.contains("FA"))
    assert(abbrevs("FA") == "Fanconi anemia")
  }

  test("IL -> interleukin when definition starts with the key char") {
    val text = "The interleukin (IL) family of cytokines was evaluated."
    val abbrevs = AbbreviationFinder.findAsMap(text)
    assert(abbrevs.get("IL").contains("interleukin"))
  }

  test("anti-interleukin rejected as definition (first char mismatch, same as reference)") {
    // reference getdefinition also fails here: 'anti-interleukin' starts
    // with 'a', not the key 'i' (AbbreviationFinder.py:174-231)
    val text = "The effects of anti-interleukin (IL)-5 antibodies were evaluated."
    assert(!AbbreviationFinder.findAsMap(text).contains("IL"))
  }

  test("candidate constraints: too long, no letters, non-alnum start are rejected") {
    assert(AbbreviationFinder.find("Something (a very long phrase that is not an acronym at all) here.").isEmpty)
    assert(AbbreviationFinder.find("A number (123) here.").isEmpty)
    assert(AbbreviationFinder.find("Strange (-X) here.").isEmpty)
  }

  test("definition token-count constraint min(|A|+5, |A|*2)") {
    // |A| = 2 -> definition can have at most 4 tokens
    val ok = AbbreviationFinder.findAsMap(
      "Patients with chronic obstructive pulmonary disease (COPD) were enrolled.")
    assert(ok.get("COPD").contains("chronic obstructive pulmonary disease"))
  }

  test("multiple abbreviations in one document, first-wins for duplicates") {
    val text = "Magnetic resonance imaging (MRI) and computed tomography (CT) were used. " +
      "A second definition of mri (MRI) should not override."
    val m = AbbreviationFinder.findAsMap(text)
    assert(m("MRI") == "Magnetic resonance imaging")
    assert(m("CT") == "computed tomography")
  }
}
