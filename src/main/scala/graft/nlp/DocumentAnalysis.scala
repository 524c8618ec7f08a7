package graft.nlp

import graft.text._
import PosTagger._

/** Full per-document NLP enrichment producing `text_mined_entities`
  * (SURVEY §2.8-2.9; reference DocumentAnalysisSpacy.process,
  * NLP.py:512-700, and NounChuncker.digest, NLP.py:306-345).
  *
  * Steps: normalize → abbreviations → abbreviation expansion → tag →
  * sentence-wise NP + SVO analysis → NP counting (plural fold, abbrev
  * transfer) → tag filters (POS, acronym consistency, short/common
  * word) → TARGET&DISEASE sentence tags → concept tag attachment →
  * embedding projections → markup.
  *
  * Deviations from the reference, deliberate and documented:
  *  - tags are computed on the abbreviation-EXPANDED text so offsets are
  *    consistent (the reference tags pre-expansion text but indexes the
  *    expanded doc — an offset bug when expansion fires, NLP.py:518-534);
  *  - the short-match case-sensitive category list is the intended
  *    {TARGET, DRUG, CHEMICAL, GENE, PROTEINCOMPLEX} (the reference has
  *    a missing-comma bug producing 'DRUGCHEMICAL', NLP.py:132).
  */
object DocumentAnalysis {

  final case class TagRecord(
      `match`: String, start: Int, end: Int, category: String,
      reference_db: String, reference: String, original_value: String,
      label: String, sentence: Option[Int])

  final case class RangeRec(start: Int, end: Int)
  final case class AbbrevRec(shortForm: String, longForm: String) // 'short'/'long' are Java keywords; renamed to reference JSON names at the sink

  final case class ConceptRecord(
      subject: String, subject_range: RangeRec,
      verb: String,
      `object`: String, object_range: RangeRec,
      negated: Boolean, sentence_text: String, sentence: Int,
      subject_tags: Map[String, Seq[TagRecord]],
      object_tags: Map[String, Seq[TagRecord]])

  final case class EmbeddingText(plain: String, pos_tag: String, ent_tag: String)

  final case class NlpAnalysis(
      chunks: Seq[String],
      recurring_chunks: Seq[String],
      top_chunks: Seq[String],
      abbreviations: Seq[AbbrevRec],
      concepts: Seq[ConceptRecord],
      tagged_entities: Seq[TagRecord],
      tagged_text: String,
      embedding_text: EmbeddingText)

  final case class NounPhrases(
      chunks: Seq[String],
      recurring_chunks: Seq[String],
      top_chunks: Seq[String],
      abbreviations: Seq[AbbrevRec])

  final case class TextMinedEntities(nlp: NlpAnalysis, noun_phrases: NounPhrases)

  private val shortMatchCaseSensitive =
    Set("TARGET", "DRUG", "CHEMICAL", "GENE", "PROTEINCOMPLEX")
  private val noisyCategories = Set.empty[String] // reference NLP.py:133

  private def toTagRecord(t: MatchedTag): TagRecord =
    TagRecord(t.matchText, t.start, t.end, t.category, t.referenceDb,
      t.reference, t.originalValue, t.label, t.sentence)

  private def posName(t: Tag): String = t match {
    case NNP => "PROPN"
    case NN => "NOUN"
    case JJ => "ADJ"
    case VB | VBN => "VERB"
    case IN => "ADP"
    case DT => "DET"
    case CD => "NUM"
    case CC => "CCONJ"
    case RB => "ADV"
    case PRP => "PRON"
    case TO => "PART"
    case THAT => "SCONJ"
    case OTHER => "X"
  }

  def analyze(rawText: String, tagger: Option[BioentityTagger]): TextMinedEntities = {
    val normalized = TextNormalizer.normalize(rawText)
    val abbreviations = AbbreviationFinder.findAsMap(normalized)

    // expand short forms when the long form is absent — boundary-less
    // substring replace, exactly the reference's
    // `analysed_text.replace(short, long)` (NLP.py:529-532)
    var document = normalized
    abbreviations.foreach { case (short, long) =>
      if (document.contains(short) && !document.contains(long))
        document = document.replace(short, long)
    }

    val rawTags = tagger.map(_.tag(document)).getOrElse(Nil)

    val sentences = BioTokenizer.sentences(document)
    // tokenize+tag+chunk each sentence exactly once; chunker and SVO
    // consume the shared results (this stage dominates enrichment CPU)
    val sentTokens = sentences.map(s => PosTagger.tag(BioTokenizer.tokenize(s.text)))
    val sentChunks = sentences.indices.toVector.map(si =>
      NounChunker.chunk(sentences(si).text, sentTokens(si)))

    // ---- concepts + noun phrases per sentence ----
    val concepts0 = sentences.indices.toVector.flatMap { si =>
      SvoExtractor.extract(sentences(si).text, sentTokens(si), sentChunks(si))
        .map(_.copy(sentence = si))
    }
    val stops = StopWords.documentAnalysis
    val nounPhrases = sentChunks.flatten.map(_.text)
      .filter(np => !stops.contains(np.toLowerCase)).distinct

    // ---- NP counting: occurrences in doc, plural fold, abbrev transfer ----
    val loweredText = document.toLowerCase
    val counter = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    nounPhrases.foreach { np =>
      val lnp = np.toLowerCase
      var c = 0
      var idx = loweredText.indexOf(lnp)
      while (idx >= 0) { c += 1; idx = loweredText.indexOf(lnp, idx + lnp.length) }
      counter(lnp) = c
    }
    // contains(np) guard: folding X may have removed X+"s" before the
    // iteration reaches it (keys X, X+"s", X+"ss") — see NounChunker
    counter.keys.toSeq.foreach { np =>
      if (counter.contains(np) && counter.contains(np + "s")) {
        counter(np) = counter(np) + counter(np + "s")
        counter.remove(np + "s")
      }
    }
    abbreviations.foreach { case (short, long) =>
      if (counter.contains(short.toLowerCase)) {
        counter(long.toLowerCase) =
          counter.getOrElse(long.toLowerCase, 0) + counter(short.toLowerCase)
        counter.remove(short.toLowerCase)
      }
    }
    val topChunks = counter.toSeq.sortBy { case (k, v) => (-v, k) }
      .filter(_._2 > 1).take(5).map(_._1)
    val recurring = counter.toSeq.filter(_._2 > 1).map(_._1)

    // ---- tag POS filter: span must contain a NOUN/PROPN/ADJ token ----
    val allowedPos: Set[Tag] = Set(NNP, NN, JJ)
    def sentenceIdxOf(start: Int, end: Int): Option[Int] =
      sentences.zipWithIndex.find { case (s, _) => start >= s.start && end <= s.end }.map(_._2)
    def tokensInRange(start: Int, end: Int): Seq[Tagged] =
      sentenceIdxOf(start, end).toSeq.flatMap { si =>
        val s = sentences(si)
        sentTokens(si).filter(t =>
          t.token.start + s.start >= start - 1 && t.token.end + s.start <= end + 1 &&
            t.token.start + s.start <= end)
      }
    val posFiltered = rawTags.filter { t =>
      val toks = tokensInRange(t.start, t.end)
      toks.exists(tok => allowedPos(tok.tag))
    }

    // ---- acronym consistency (NLP.py:599-620): a tag matching a defined
    // short form is dropped (the reference's get_tag_by_match is dead
    // code that always returns [], making the drop unconditional); tags
    // matching a long form extend to the short form's occurrences ----
    val shortForms = abbreviations.keySet.map(_.toLowerCase)
    val longToShort = abbreviations.map { case (s, l) => l.toLowerCase -> s }
    val extensions = posFiltered.flatMap { t =>
      longToShort.get(t.matchText.toLowerCase).toSeq.flatMap { short =>
        val ls = short.toLowerCase
        val ld = document.toLowerCase
        Iterator.unfold(ld.indexOf(ls)) { idx =>
          if (idx < 0) None
          else Some((idx, ld.indexOf(ls, idx + ls.length)))
        }.filter { idx =>
          val l = idx == 0 || BioentityTagger.separators(ld.charAt(idx - 1))
          val r = idx + ls.length == ld.length || BioentityTagger.separators(ld.charAt(idx + ls.length))
          l && r
        }.map(idx => t.copy(matchText = ls, start = idx, end = idx + ls.length))
          .toSeq
      }
    }
    var filteredTags = (posFiltered.filter(t => !shortForms.contains(t.matchText.toLowerCase)) ++ extensions)
      .sortBy(t => (t.start, -t.end))

    // ---- short/common-word filter (NLP.py:622-641) ----
    val brown = StopWords.brownCommon
    filteredTags = filteredTags.filter { t =>
      if (shortMatchCaseSensitive(t.category) &&
          (t.matchText.length < 4 ||
            (t.matchText.length < 7 && brown.contains(t.matchText)))) {
        val orig = document.substring(t.start, math.min(t.end, document.length))
        orig == t.label || orig.replace("-", "") == t.label ||
          orig.replace("-", " ") == t.label
      } else if (noisyCategories(t.category)) {
        !brown.contains(t.matchText)
      } else true
    }

    // ---- TARGET&DISEASE sentence tags (NLP.py:643-650) ----
    val tdTags = sentences.flatMap { s =>
      val inSent = filteredTags.filter(t => t.start >= s.start && t.end <= s.end)
      val cats = inSent.map(_.category).toSet
      if (cats.contains("GENE") && cats.contains("DISEASE"))
        Some(MatchedTag("target-disease", s.start, s.end, "TARGET&DISEASE",
          "OPENTARGETS", "", "", ""))
      else None
    }
    val finalTags = filteredTags ++ tdTags

    // ---- concept tag attachment (NLP.py:652-686) ----
    val conceptRecords = concepts0.map { c =>
      val s = sentences(c.sentence)
      val sbjTags = finalTags.filter(t =>
        t.start >= s.start + c.subjectRange.start && t.end <= s.start + c.subjectRange.end)
        .map(t => toTagRecord(t.copy(start = t.start - s.start, end = t.end - s.start)))
      val objTags = finalTags.filter(t =>
        t.start >= s.start + c.objectRange.start && t.end <= s.start + c.objectRange.end)
        .map(t => toTagRecord(t.copy(start = t.start - s.start, end = t.end - s.start)))
      ConceptRecord(
        subject = c.subject,
        subject_range = RangeRec(c.subjectRange.start, c.subjectRange.end),
        verb = c.verb,
        `object` = c.`object`,
        object_range = RangeRec(c.objectRange.start, c.objectRange.end),
        negated = c.negated,
        sentence_text = c.sentenceText,
        sentence = c.sentence,
        subject_tags = sbjTags.groupBy(_.category).view.mapValues(_.toSeq).toMap,
        object_tags = objTags.groupBy(_.category).view.mapValues(_.toSeq).toMap)
    }

    // ---- embedding projections (NLP.py:688-690, 742-799, 1130-1178) ----
    val embedding = buildEmbeddingText(document, sentences, sentTokens, sentChunks, finalTags, stops)

    // NounChuncker-side analyzer (keyed "noun_phrases", reference
    // NLP.py:347-348, main.py:473-523 runs BOTH analyzers per doc):
    // same chunk stream, TextBlob-style counting semantics
    val npDigest = NounChunker.digest(document, abbreviations, stops,
      sentChunks.flatten.map(_.text))

    val abbrevRecs = abbreviations.map { case (s, l) => AbbrevRec(s, l) }.toSeq
    val nlp = NlpAnalysis(
      chunks = nounPhrases,
      recurring_chunks = recurring,
      top_chunks = topChunks,
      abbreviations = abbrevRecs,
      concepts = conceptRecords.toList,
      tagged_entities = finalTags.map(toTagRecord),
      tagged_text = BioentityTagger.markTagsInText(document, finalTags),
      embedding_text = embedding)

    val np = NounPhrases(npDigest.chunks, npDigest.recurringChunks,
      npDigest.topChunks, abbrevRecs)

    TextMinedEntities(nlp, np)
  }

  private def buildEmbeddingText(
      document: String,
      sentences: Vector[Sentence],
      sentTokens: Vector[Vector[Tagged]],
      sentChunks: Vector[Vector[NounChunker.NPChunk]],
      tags: Seq[MatchedTag],
      stops: Set[String]): EmbeddingText = {

    // per sentence: merge NP-chunk tokens into single '_'-joined units
    final case class Unit(text: String, pos: String, start: Int, end: Int)
    val sentUnits: Vector[Vector[Unit]] = sentences.indices.toVector.map { si =>
      val toks = sentTokens(si)
      val chunks = sentChunks(si).filter(_.text.contains(" "))
      val out = scala.collection.mutable.ArrayBuffer.empty[Unit]
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        chunks.find(c => c.start <= t.token.start && t.token.end <= c.end) match {
          case Some(c) =>
            // gather all tokens inside this chunk
            var j = i
            while (j < toks.length && toks(j).token.end <= c.end) j += 1
            out += Unit(c.text.replace(' ', '_'), "NOUN", c.start, c.end)
            i = j
          case None =>
            out += Unit(t.token.text, posName(t.tag), t.token.start, t.token.end)
            i += 1
        }
      }
      out.toVector
    }

    def keep(u: Unit): Boolean = {
      val lw = u.text.toLowerCase
      lw.nonEmpty && !stops.contains(lw) && !StopWords.symbols.contains(lw) &&
        u.text.exists(_.isLetterOrDigit)
    }

    val plain = sentUnits.map(units =>
      units.filter(keep).map(_.text.toLowerCase).mkString(" ")).mkString("\n")

    val posTagged = sentUnits.map(units =>
      units.filter(keep).map(u => s"${u.text.toLowerCase}|${u.pos}").mkString(" ")).mkString("\n")

    // entity-tagged: token units covered by a tag become ref|CATEGORY|label
    val skipCats = Set("TARGET&DISEASE")
    val entTagged = sentences.indices.map { si =>
      val s = sentences(si)
      sentUnits(si).filter(keep).map { u =>
        val covering = tags.find(t => !skipCats(t.category) &&
          t.start <= u.start + s.start && u.end + s.start <= t.end)
        covering match {
          case Some(t) =>
            val ref = if (t.reference.contains("/")) t.reference.substring(t.reference.lastIndexOf('/') + 1)
              else t.reference
            s"${ref.toLowerCase}|${t.category}|${BioentityTagger.sanitizeString(t.label)}"
          case None => u.text.toLowerCase
        }
      }.mkString(" ")
    }.mkString("\n")

    EmbeddingText(plain, posTagged, entTagged)
  }
}
