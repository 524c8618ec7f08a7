package graft.nlp

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{BioentityTagger, TextNormalizer}
import graft.ops.VocabularySource

/** Full DocumentAnalysis over the reference's 27-abstract corpus
  * (reference tests/test_tagger.py + text_nlp.py:417-431) — structural
  * invariants must hold on every real abstract, not just goldens. */
class AbstractCorpusSpec extends AnyFunSuite {

  lazy val abstracts: List[String] = scala.io.Source.fromFile(
    "/root/reference/tests/resources/test_abstract_nlp.txt", "UTF-8")
    .getLines().filter(_.trim.nonEmpty).toList

  lazy val tagger = BioentityTagger.build(
    VocabularySource.load(getClass.getResource("/vocab").getPath))

  test("27 abstracts load") {
    assert(abstracts.length == 28) // 28 non-blank lines (last without newline)
  }

  test("document analysis holds invariants on every abstract") {
    abstracts.foreach { raw =>
      val tme = DocumentAnalysis.analyze(raw, Some(tagger))
      val nlp = tme.nlp
      val doc = {
        // reconstruct the analyzed text the same way analyze() does
        val norm = TextNormalizer.normalize(raw)
        val abbrevs = graft.text.AbbreviationFinder.findAsMap(norm)
        var d = norm
        abbrevs.foreach { case (s, l) =>
          if (d.contains(s) && !d.contains(l)) d = d.replace(s, l)
        }
        d
      }
      // tag offsets index the lowercased analyzed text
      nlp.tagged_entities.filter(_.category != "TARGET&DISEASE").foreach { t =>
        assert(t.start >= 0 && t.end <= doc.length)
        assert(doc.toLowerCase.substring(t.start, t.end) == t.`match`)
      }
      // top chunks strictly fewer than chunks (text_nlp.py:431)
      assert(nlp.top_chunks.length < math.max(nlp.chunks.length, 1))
      // concept ranges live inside their sentence
      nlp.concepts.foreach { c =>
        assert(c.subject_range.start >= 0 && c.subject_range.end <= c.sentence_text.length)
        assert(c.object_range.start >= 0 && c.object_range.end <= c.sentence_text.length)
        assert(c.sentence_text.substring(c.subject_range.start, c.subject_range.end) == c.subject)
        assert(c.sentence_text.substring(c.object_range.start, c.object_range.end) == c.`object`)
      }
      // markup strips back to the analyzed text (strip only the exact
      // mark/div wrappers — abstracts contain literal '<', e.g. "age < or =40")
      val stripped = nlp.tagged_text
        .replaceAll("</?mark-\\d+[^>]*>", "")
        .replace("""<div  class="entities">""", "")
        .replace("</div></br>", "")
      assert(stripped == doc)
      // embedding projections have one line per sentence
      val nSents = graft.text.BioTokenizer.sentences(doc).length
      assert(nlp.embedding_text.plain.split("\n", -1).length == nSents)
    }
  }

  test("corpus yields a healthy volume of analysis output") {
    val all = abstracts.map(a => DocumentAnalysis.analyze(a, Some(tagger)))
    val totalConcepts = all.map(_.nlp.concepts.length).sum
    val totalChunks = all.map(_.nlp.chunks.length).sum
    assert(totalConcepts > 50, s"only $totalConcepts concepts from 27 abstracts")
    assert(totalChunks > 200, s"only $totalChunks chunks")
    // the known diseases in this corpus get tagged
    val tagged = all.flatMap(_.nlp.tagged_entities.map(_.`match`)).toSet
    assert(tagged.contains("asthma"))
  }
}
