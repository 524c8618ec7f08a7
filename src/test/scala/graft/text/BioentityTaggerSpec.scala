package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Tagger semantics from reference BioentityTagger.py §2.8: boundary
  * checks, dash variants, stopword gating, nested-span removal per
  * category group, multi-category merge, markup generation.
  */
class BioentityTaggerSpec extends AnyFunSuite {

  val genes = Vocabulary("GENE", "OPENTARGETS", Map(
    "ADRA1A" -> VocabEntry(Seq("ENSG00000120907"), "ADRA1D"),
    "PPP3CC" -> VocabEntry(Seq("ENSG00000120910"), "PPP3CC"),
    "NRG1" -> VocabEntry(Seq("ENSG00000157168"), "NRG1"),
    "c-ABL" -> VocabEntry(Seq("ENSG00000097007"), "ABL1"),
  ))
  val diseases = Vocabulary("DISEASE", "OPENTARGETS", Map(
    "asthma" -> VocabEntry(Seq("EFO_0000270"), "asthma"),
    "schizophrenia" -> VocabEntry(Seq("EFO_0000692"), "schizophrenia"),
    "airway inflammation" -> VocabEntry(Seq("EFO_INF"), "airway inflammation"),
    "inflammation" -> VocabEntry(Seq("EFO_0000270x"), "inflammation"),
    "the" -> VocabEntry(Seq("XXX"), "bogus stopword entry"), // gated out (len 3, in stopwords if present)
    "ab" -> VocabEntry(Seq("YYY"), "too short"), // gated out (len <= 2)
  ))

  val tagger = BioentityTagger.build(Seq(genes, diseases))

  test("case-insensitive match with word boundaries") {
    val tags = tagger.tag("Severe asthma affects some subjects; asthmatic does not count.")
    val asthma = tags.filter(_.category == "DISEASE")
    assert(asthma.length == 1) // "asthmatic" must NOT match (no right boundary)
    assert(asthma.head.matchText == "asthma")
    assert(asthma.head.start == 7)
    assert(asthma.head.end == 13)
  }

  test("match at string start and end") {
    val tags = tagger.tag("asthma links to NRG1")
    assert(tags.exists(t => t.matchText == "asthma" && t.start == 0))
    assert(tags.exists(t => t.matchText == "nrg1" && t.end == 20))
  }

  test("offsets index the lowercased text correctly") {
    val text = "Variants of ADRA1A and PPP3CC associate with schizophrenia."
    val tags = tagger.tag(text)
    tags.foreach { t =>
      assert(text.toLowerCase.substring(t.start, t.end) == t.matchText)
    }
    assert(tags.exists(_.label == "ADRA1D"))
    assert(tags.exists(_.label == "PPP3CC"))
  }

  test("dash variant: c-ABL also matches cABL") {
    val tags = tagger.tag("The cABL kinase and c-ABL are the same entity.")
    assert(tags.count(_.category == "GENE") == 2)
  }

  test("nested span removed within same category group") {
    // "airway inflammation" contains "inflammation"; keep outermost only
    val tags = tagger.tag("Chronic airway inflammation was observed.")
    val d = tags.filter(_.category == "DISEASE")
    assert(d.length == 1)
    assert(d.head.matchText == "airway inflammation")
  }

  test("too-short surface forms are not indexed") {
    assert(tagger.tag("ab positive").isEmpty)
  }

  test("tags sorted by (start, -end)") {
    val tags = tagger.tag("asthma, schizophrenia and airway inflammation in NRG1 carriers")
    val sortedTags = tags.sortBy(t => (t.start, -t.end))
    assert(tags == sortedTags)
  }

  test("tagsInRange filters by containment") {
    val text = "asthma links NRG1. schizophrenia separate."
    val tags = tagger.tag(text)
    val inFirst = tagger.tagsInRange(tags, 0, 18)
    assert(inFirst.exists(_.matchText == "asthma"))
    assert(inFirst.exists(_.matchText == "nrg1"))
    assert(!inFirst.exists(_.matchText == "schizophrenia"))
  }

  test("markTagsInText inserts balanced marks") {
    val text = "asthma and NRG1"
    val tags = tagger.tag(text)
    val marked = BioentityTagger.markTagsInText(text, tags)
    assert(marked.startsWith("""<div  class="entities">"""))
    assert(marked.contains("<mark-0"))
    assert(marked.contains("</mark-0>"))
    assert(marked.contains("<mark-1"))
    // the plain text with markup stripped equals the original
    val stripped = marked
      .replaceAll("<[^>]+>", "")
    assert(stripped == text)
  }

  test("sanitizeString strips unicode punctuation") {
    assert(BioentityTagger.sanitizeString("Parkinson's disease (PD), type-2!") ==
      "Parkinsons disease PD type2")
  }

  test("partial match: long token of multi-word surface with fuzzy gate") {
    val v = Vocabulary("DISEASE", "MESH", Map(
      "pulmonary hypertension" -> VocabEntry(Seq("D006976"), "Hypertension, Pulmonary")))
    val pt = BioentityTagger.build(Seq(v), partialMatch = true)
    // matched token + trailing window fuzzily completes the surface
    // ("pulmonary hypertensive" ~ "pulmonary hypertension", ratio 91)
    val hit = pt.tag("The pulmonary hypertensive group was studied.")
    assert(hit.exists(t => t.category == "DISEASE" && t.matchText == "pulmonary"), hit)
    // isolated token in unrelated context fails the gate
    val miss = pt.tag("Systemic hypertension was treated with diet.")
    assert(!miss.exists(_.matchText == "hypertension"), miss)
    // exact full-surface match still tags normally
    assert(pt.tag("Severe pulmonary hypertension worsened.")
      .exists(_.matchText == "pulmonary hypertension"))
  }

  test("tokenSortRatio: order-insensitive similarity") {
    assert(BioentityTagger.tokenSortRatio("pulmonary hypertension", "hypertension pulmonary") == 100)
    assert(BioentityTagger.tokenSortRatio("abc", "abc") == 100)
    assert(BioentityTagger.tokenSortRatio("abc def", "abc xyz") < 90)
  }

  test("multi-category merge: same surface in two vocabularies tags both") {
    val v1 = Vocabulary("GENE", "OPENTARGETS", Map(
      "LDL" -> VocabEntry(Seq("ENSG_LDL"), "LDL")))
    val v2 = Vocabulary("CHEMICAL", "MESH", Map(
      "LDL" -> VocabEntry(Seq("D008078"), "Lipoproteins, LDL")))
    val t2 = BioentityTagger.build(Seq(v1, v2))
    val tags = t2.tag("Elevated LDL levels")
    assert(tags.map(_.category).toSet == Set("GENE", "CHEMICAL"))
  }
}
