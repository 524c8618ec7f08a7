package graft.nlp

import graft.text.{BioTokenizer, Sentence, Token}
import PosTagger._

/** Noun-phrase chunking via tag-pair rewrite grammar (SURVEY §2.9 N4;
  * reference PerceptronNPExtractor, NLP.py:226-297): iterate a CFG over
  * adjacent tag pairs to fixpoint; NPs are the surviving {NNP, NNI, NN}
  * spans. The CFG table is the reference's (NLP.py:234-248) plus
  * compound-proper extensions ((NNI,NNP), (NNP,NNP) chains) needed to
  * reproduce the spaCy-side golden chunks like "Polo-like kinase PLK1".
  */
object NounChunker {

  final case class NPChunk(text: String, start: Int, end: Int)

  private type CTag = String

  /** Reference CFG (NLP.py:234-248) + compound extensions. */
  val cfg: Map[(CTag, CTag), CTag] = Map(
    ("NNP", "NNP") -> "NNP",
    ("NNP", "NN") -> "NNP",
    ("NN", "NNS") -> "NNP",
    ("NNP", "PO") -> "NNP",
    ("NN", "NN") -> "NNI",
    ("NNI", "NN") -> "NNI",
    ("JJ", "JJ") -> "JJ",
    ("JJ", "NN") -> "NNI",
    ("NN", "JJ") -> "NNI",
    // extensions for proper-noun compounds (spaCy-side behavior)
    ("NNI", "NNP") -> "NNP",
    ("NN", "NNP") -> "NNP",
    ("JJ", "NNP") -> "NNP",
    ("NNP", "NNI") -> "NNP",
  )

  private final case class Item(text: String, tag: CTag, start: Int, end: Int,
      blockMergeRight: Boolean)

  private def coarse(t: Tag): CTag = t match {
    case NNP => "NNP"
    case NN => "NN"
    case JJ => "JJ"
    case _ => "X"
  }

  /** Whether raw text between two tokens contains punctuation that
    * blocks NP merging (comma, semicolon, parens...). */
  private def separatedBy(text: String, a: Token, b: Token): Boolean = {
    val between = text.substring(math.min(a.end, text.length),
      math.min(b.start, text.length))
    between.exists(c => !c.isWhitespace)
  }

  /** Noun phrases of one sentence (offsets relative to sentence text). */
  def chunk(sentenceText: String): Vector[NPChunk] =
    chunk(sentenceText, PosTagger.tag(BioTokenizer.tokenize(sentenceText)))

  /** Chunk with precomputed tagged tokens (the enrichment hot path
    * tokenizes/tags each sentence exactly once and threads the result
    * through chunker + SVO). */
  def chunk(sentenceText: String, tagged: Vector[Tagged]): Vector[NPChunk] = {
    val tokens = tagged.map(_.token)
    var items = tagged.zipWithIndex.map { case (tg, i) =>
      val block = i + 1 < tokens.length &&
        separatedBy(sentenceText, tokens(i), tokens(i + 1))
      Item(tg.token.text, coarse(tg.tag), tg.token.start, tg.token.end, block)
    }
    // iterate CFG merges to fixpoint (first applicable pair per pass,
    // like the reference's while-merge loop NLP.py:274-293)
    var merged = true
    while (merged) {
      merged = false
      var x = 0
      while (!merged && x < items.length - 1) {
        val t1 = items(x)
        val t2 = items(x + 1)
        if (!t1.blockMergeRight) {
          cfg.get((t1.tag, t2.tag)) match {
            case Some(newTag) =>
              merged = true
              // merged text = the actual span substring, so chunk text
              // always equals sentence[start:end) — the invariant the
              // reference pins at tests/text_nlp.py:451-464
              items = (items.take(x) :+
                Item(sentenceText.substring(t1.start, t2.end), newTag,
                  t1.start, t2.end, t2.blockMergeRight)) ++ items.drop(x + 2)
            case None =>
          }
        }
        x += 1
      }
    }
    items.filter(i => i.tag == "NNP" || i.tag == "NNI" || i.tag == "NN")
      .map(i => NPChunk(i.text, i.start, i.end))
  }

  /** Document-level digest: chunks + plural folding + abbreviation count
    * transfer + substring co-counts (SURVEY §2.4 A3; reference
    * NounChuncker.digest NLP.py:306-345 and the spaCy-side equivalent
    * NLP.py:559-578). All per-row, inside the enrichment UDF.
    */
  final case class ChunkDigest(
      chunks: Seq[String],
      recurringChunks: Seq[String],
      topChunks: Seq[String])

  def digest(text: String, abbreviations: Map[String, String],
      stopwords: Set[String]): ChunkDigest = {
    val sents = BioTokenizer.sentences(text)
    digest(text, abbreviations, stopwords,
      sents.flatMap(s => chunk(s.text).map(_.text)))
  }

  /** Digest with precomputed per-sentence noun phrases. Counting follows
    * the reference's NounChuncker (NLP.py:306-345): frequency of each NP
    * in the extraction stream (TextBlob lowercases), defined-acronym
    * long forms guaranteed present, plural folding, abbreviation
    * short→long count transfer, then substring co-counts (+1 for every
    * other NP that contains this one). */
  def digest(text: String, abbreviations: Map[String, String],
      stopwords: Set[String], allNps: Seq[String]): ChunkDigest = {
    val stream = allNps
      .filter(np => !stopwords.contains(np.toLowerCase))
      .map(_.toLowerCase)
    val counter = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    stream.foreach(np => counter(np) = counter.getOrElse(np, 0) + 1)
    // defined acronyms' long forms used as noun phrases (NLP.py:311-314)
    abbreviations.values.foreach { long =>
      val ll = long.toLowerCase
      if (!counter.contains(ll)) counter(ll) = 1
    }
    val base = counter.keys.toList // chunks = keys before folding (NLP.py:324)
    // fold plurals: np + "s" merges into np (NLP.py:326-329). The
    // contains(np) guard matters: with keys X, X+"s", X+"ss", folding X
    // removes X+"s" before the iteration reaches it (the reference's
    // py2 dict loop would KeyError on the same input).
    counter.keys.toSeq.foreach { np =>
      if (counter.contains(np) && counter.contains(np + "s")) {
        counter(np) = counter(np) + counter(np + "s")
        counter.remove(np + "s")
      }
    }
    // abbreviation short→long count transfer (NLP.py:331-335)
    abbreviations.foreach { case (short, long) =>
      val ls = short.toLowerCase
      val ll = long.toLowerCase
      if (counter.contains(ls)) {
        counter(ll) = counter.getOrElse(ll, 0) + counter(ls)
        counter.remove(ls)
      }
    }
    // substring co-counts (NLP.py:338-341)
    val keys = counter.keys.toList
    keys.foreach { k =>
      keys.foreach { s => if (k != s && s.contains(k)) counter(k) += 1 }
    }
    val top = counter.toSeq.sortBy { case (k, v) => (-v, k) }
      .filter(_._2 > 1).take(5).map(_._1)
    val recurring = counter.toSeq.filter(_._2 > 1).map(_._1)
    ChunkDigest(base, recurring, top)
  }
}
