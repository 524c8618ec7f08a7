package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer invariants pinned by reference tests/text_nlp.py:377-389
  * and 433-449. */
class BioTokenizerSpec extends AnyFunSuite {

  val pathological =
    "The effects were measured at 10(-7) M with (Na++K+)-ATPase activity " +
      "increased 2.7-fold and 4.5- fold in 86Rb+ uptake in Ca++-containing " +
      "medium, with (Na++K)-ATPase and Ouabain-sensitive transport in cells, " +
      "(1 and 2) th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se fibroblasts."

  test("keeps complex bio tokens intact") {
    val toks = BioTokenizer.tokens(pathological)
    assert(toks.contains("10(-7)"))
    assert(toks.contains("(Na++K+)-ATPase"))
    assert(toks.contains("2.7-fold"))
    assert(toks.contains("4.5-"))
    assert(toks.contains("86Rb+"))
    assert(toks.contains("Ca++-containing"))
    assert(toks.contains("(Na++K)-ATPase"))
    assert(toks.contains("Ouabain-sensitive"))
    assert(toks.contains("th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se"))
    assert(!toks.contains("cells,"))
    assert(!toks.contains("(1"))
    assert(!toks.contains("fibroblasts."))
  }

  test("token offsets are consistent with the text") {
    val text = "Asthma is a chronic disease, characterized by (airway) inflammation."
    BioTokenizer.tokenize(text).foreach { t =>
      assert(text.substring(t.start, t.end) == t.text)
    }
  }

  test("sentence split at period+space even before lowercase; newline does not split") {
    val text = "This is a test, for a complex entity name: " +
      "th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se this_is-simpler. " +
      "but this is an other sentence\nand this is after a new line"
    val sents = BioTokenizer.sentences(text)
    assert(sents.length == 2)
    val toks0 = BioTokenizer.tokens(sents(0).text)
    assert(toks0.contains("th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se"))
    assert(toks0.contains("this_is-simpler"))
    assert(!toks0.contains("name:"))
    assert(!toks0.contains("this_is-simpler."))
    assert(!toks0.contains("sentence"))
    assert(!toks0.contains("line"))
    val toks1 = BioTokenizer.tokens(sents(1).text)
    assert(toks1.contains("sentence"))
    assert(toks1.contains("line"))
    assert(!toks1.contains("sentence\nand"))
  }

  test("sentence offsets are consistent") {
    val text = "One sentence here. Another one! And a third? Trailing"
    val sents = BioTokenizer.sentences(text)
    assert(sents.length == 4)
    sents.foreach(s => assert(text.substring(s.start, s.end) == s.text))
  }
}
