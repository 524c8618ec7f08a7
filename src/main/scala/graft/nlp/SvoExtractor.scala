package graft.nlp

import graft.text.BioTokenizer
import PosTagger._
import NounChunker.NPChunk

/** Pattern-based subject–verb–object concept extraction (SURVEY §2.9
  * N6; reference SentenceAnalysisSpacy, NLP.py:804-1114).
  *
  * The reference walks a spaCy dependency parse; with no parser
  * available offline, this is a rule/pattern extractor over POS tags and
  * NP chunks targeting the reference's own golden assertions
  * (tests/text_nlp.py:58-250) — copulas, passive "be X-ed by",
  * reporting-verb complements ("suggested that X reduces Y"),
  * purpose infinitives ("performed to evaluate X"), comparative copulas
  * ("were higher in X than in Y") and conjoined objects. Full spaCy
  * parse parity is explicitly out of scope (SURVEY §7).
  */
object SvoExtractor {

  final case class Range(start: Int, end: Int)

  /** Concept record (reference NLP.py:1095-1110). Ranges are char
    * offsets into the sentence text. */
  final case class Concept(
      subject: String,
      subjectRange: Range,
      verb: String,
      `object`: String,
      objectRange: Range,
      negated: Boolean,
      sentenceText: String,
      sentence: Int = -1)

  private val irregularLemma = Map(
    "is" -> "be", "are" -> "be", "was" -> "be", "were" -> "be",
    "been" -> "be", "being" -> "be", "am" -> "be",
    "has" -> "have", "had" -> "have",
    "shown" -> "show", "showed" -> "show",
    "found" -> "find", "thought" -> "think", "known" -> "know",
    "began" -> "begin", "begun" -> "begin", "won" -> "win",
    "did" -> "do", "does" -> "do")

  /** Lemma for the leading verb of a composed verb phrase. */
  def lemma(word: String): String = {
    val lw = word.toLowerCase
    irregularLemma.get(lw).getOrElse {
      if (lw.endsWith("ies") && lw.length > 4) lw.dropRight(3) + "y"
      else if (lw.endsWith("sses") || lw.endsWith("shes") || lw.endsWith("ches")) lw.dropRight(2)
      else if (lw.endsWith("ed") && lw.length > 3) {
        val base = lw.dropRight(2)
        if (base.endsWith("i")) base.dropRight(1) + "y" // identified→identify
        else if (base.endsWith("at") || base.endsWith("iz") || base.endsWith("uc") ||
          base.endsWith("as") || base.endsWith("ar") || base.endsWith("or") ||
          base.endsWith("ir") || base.endsWith("ur") || base.endsWith("id") ||
          base.endsWith("in") || base.endsWith("erv") || base.endsWith("cat") ||
          base.endsWith("u") || base.endsWith("eas")) base + "e"
        else base
      }
      else if (lw.endsWith("s") && !lw.endsWith("ss") && lw.length > 3) lw.dropRight(1)
      else lw
    }
  }

  private final case class Tok(text: String, lower: String, tag: Tag, start: Int, end: Int)

  /** Extract concepts from one sentence. */
  def extract(sentenceText: String): List[Concept] = {
    val tagged = PosTagger.tag(BioTokenizer.tokenize(sentenceText))
    extract(sentenceText, tagged, NounChunker.chunk(sentenceText, tagged))
  }

  /** Extract with precomputed tags + chunks (single-pass hot path). */
  def extract(sentenceText: String, tagged: Vector[PosTagger.Tagged],
      chunks: Vector[NPChunk]): List[Concept] = {
    if (tagged.isEmpty) return Nil
    val toks = tagged.map(t => Tok(t.token.text, t.token.text.toLowerCase,
      t.tag, t.token.start, t.token.end))

    /** Subject of a clause: the nearest NP chain before `pos` (bounded
      * below by `minPos`), walked left through of/and/or/comma links —
      * its LEFTMOST NP is the head subject ("The serum levels of CA125,
      * CA15.3, and HE4 were..." → "serum levels"; the reference gets
      * this from the nsubj dependency). */
    def chunkBefore(pos: Int, minPos: Int = 0): Option[NPChunk] = {
      val before = chunks.filter(c => c.end <= pos && c.start >= minPos).sortBy(_.start)
      if (before.isEmpty) return None
      var idx = before.length - 1
      while (idx > 0) {
        val gap = sentenceText.substring(before(idx - 1).end, before(idx).start)
        val gapWords = gap.split("[^\\p{L}]+").filter(_.nonEmpty)
        val linked = gapWords.forall(w =>
          Set("of", "and", "or").contains(w.toLowerCase)) &&
          gap.forall(c => c.isLetter || c.isWhitespace || c == ',')
        if (linked) idx -= 1 else return Some(before(idx))
      }
      Some(before(idx))
    }
    def chunksAfter(pos: Int, until: Int): Vector[NPChunk] =
      chunks.filter(c => c.start >= pos && c.end <= until).sortBy(_.start).toVector

    val isVerbTag = (t: Tag) => t == VB || t == VBN
    val negated = toks.exists(t => t.lower == "not" || t.lower == "no" || t.lower == "n't")

    val concepts = scala.collection.mutable.ListBuffer.empty[Concept]
    def emit(subj: NPChunk, verb: String, obj: NPChunk): Unit =
      if (subj.text != obj.text)
        concepts += Concept(subj.text, Range(subj.start, subj.end), verb,
          obj.text, Range(obj.start, obj.end), negated, sentenceText)

    // locate verb-group heads: first verb token of each maximal verb run
    var i = 0
    while (i < toks.length) {
      if (isVerbTag(toks(i).tag)) {
        val groupStart = i
        var j = i
        while (j + 1 < toks.length &&
          (isVerbTag(toks(j + 1).tag) || toks(j + 1).tag == RB)) j += 1
        val groupEnd = j // inclusive
        val verbToks = toks.slice(groupStart, groupEnd + 1).filter(t => isVerbTag(t.tag))
        val headVerb = verbToks.last
        val isCopula = PosTagger.beForms(verbToks.head.lower) && verbToks.forall(t =>
          PosTagger.beForms(t.lower) || t.tag == RB)
        val subject = chunkBefore(toks(groupStart).start)

        // window of this clause: up to next verb token or sentence end
        var k = groupEnd + 1
        while (k < toks.length && !isVerbTag(toks(k).tag)) k += 1
        val clauseEnd = if (k < toks.length) toks(k).start else sentenceText.length

        val afterIdx = groupEnd + 1

        if (subject.isDefined) {
          val subj = subject.get

          if (isCopula) {
            // pattern: BE [DT] NP ... → (S, be, NP)
            val objs = chunksAfter(headVerb.end, clauseEnd)
            // comparative: BE [RB] JJ IN NP [than IN NP2]
            val adjIdx = (afterIdx until toks.length)
              .takeWhile(x => x < toks.length && toks(x).end <= clauseEnd)
              .find(x => toks(x).tag == JJ && PosTagger.comparatives(toks(x).lower))
            adjIdx match {
              case Some(ai) =>
                val adj = toks(ai).lower
                // segment objects by a "than" boundary
                val thanIdx = toks.indexWhere(t => t.lower == "than", ai)
                val firstObjs = chunksAfter(toks(ai).end,
                  if (thanIdx >= 0) toks(thanIdx).start else clauseEnd)
                firstObjs.headOption.foreach(o => emit(subj, s"be $adj", o))
                if (thanIdx >= 0)
                  chunksAfter(toks(thanIdx).end, sentenceText.length)
                    .headOption.foreach(o => emit(subj, s"be $adj than", o))
              case None =>
                objs.headOption.foreach { o =>
                  emit(subj, "be", o)
                  // participial attachment: NP VBN IN → (S, be VBN IN, NPs)
                  val vbnIdx = toks.indexWhere(t => t.tag == VBN, afterIdx)
                  if (vbnIdx >= 0 && vbnIdx + 1 < toks.length &&
                      toks(vbnIdx).start >= o.end &&
                      toks(vbnIdx + 1).tag == IN) {
                    val prep = toks(vbnIdx + 1).lower
                    val pObjs = chunksAfter(toks(vbnIdx + 1).end, sentenceText.length)
                    pObjs.foreach(po =>
                      emit(subj, s"be ${toks(vbnIdx).lower} $prep", po))
                  }
                }
            }
          } else {
            // lemma of the MAIN (last lexical) verb, not a leading aux:
            // "have been performed" → perform, "have suggested" → suggest
            val headLemma = lemma(verbToks.last.lower)
            // passive purpose: V-ed/been V-ed TO V2 → (S, lemma(V) V2raw, objs after V2)
            val toIdx = if (afterIdx < toks.length && toks(afterIdx).tag == TO) afterIdx else -1
            // complement: V that S2 V2 O2 → (S2, lemma(V) V2raw, O2)
            val thatIdx = if (afterIdx < toks.length && toks(afterIdx).tag == THAT) afterIdx else -1

            if (thatIdx >= 0) {
              // embedded clause
              val embVerbIdx = toks.indexWhere(t => isVerbTag(t.tag), thatIdx + 1)
              if (embVerbIdx >= 0) {
                val embSubj = chunkBefore(toks(embVerbIdx).start, toks(thatIdx).end)
                // embedded clause objects: to end of sentence, also across
                // conjoined verbs ("reduces X and prevent Y")
                var v = embVerbIdx
                while (v < toks.length) {
                  if (isVerbTag(toks(v).tag) && v > embVerbIdx ||
                      v == embVerbIdx) {
                    var e = v + 1
                    while (e < toks.length && !isVerbTag(toks(e).tag)) e += 1
                    val objEnd = if (e < toks.length) toks(e).start else sentenceText.length
                    val objs = chunksAfter(toks(v).end, objEnd)
                    for (s2 <- embSubj; o <- objs)
                      emit(s2, s"$headLemma ${toks(v).lower}", o)
                  }
                  v += 1
                }
              }
            } else if (toIdx >= 0 && toIdx + 1 < toks.length && isVerbTag(toks(toIdx + 1).tag)) {
              val v2 = toks(toIdx + 1)
              val objs = chunksAfter(v2.end, sentenceText.length)
              objs.foreach(o => emit(subj, s"$headLemma ${v2.lower}", o))
            } else {
              // simple transitive: objects within the clause
              val verbText =
                if (verbToks.length > 1 &&
                    !PosTagger.auxiliaries(verbToks.head.lower))
                  s"${lemma(verbToks.head.lower)} ${verbToks.last.lower}"
                else headLemma
              val objs = chunksAfter(headVerb.end, clauseEnd)
              objs.foreach(o => emit(subj, verbText, o))
            }
          }
        }
        i = groupEnd + 1
      } else i += 1
    }
    concepts.toList.distinct
  }

  /** Document-level extraction: per-sentence concepts with sentence index
    * (reference NLP.py:546-554). */
  def extractDocument(text: String): List[Concept] =
    BioTokenizer.sentences(text).zipWithIndex.flatMap { case (s, si) =>
      extract(s.text).map(_.copy(sentence = si))
    }.toList
}
