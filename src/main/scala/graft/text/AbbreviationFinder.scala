package graft.text

import scala.collection.mutable

/** Schwartz–Hearst abbreviation detection.
  *
  * "A Simple Algorithm for Identifying Abbreviation Definitions in
  * Biomedical Text", Schwartz & Hearst, Biocomputing 2003, pp 451-462 —
  * the same published algorithm the reference ports
  * (reference AbbreviationFinder.py:51-323). Implemented from the paper's
  * semantics with the reference's parameterization:
  *
  *  - candidate short forms are bracket-delimited (`()[]{}<>`),
  *    2..10 chars, ≤2 tokens, contain a letter, start alphanumeric
  *    (AbbreviationFinder.py:298-323);
  *  - the definition is searched right-to-left in the tokens before the
  *    bracket, matching short-form characters in order, requiring the
  *    first character to start a token; the LONGEST valid definition wins
  *    (AbbreviationFinder.py:233-296);
  *  - the definition must satisfy |tokens| ≤ min(|A|+5, |A|·2)
  *    (AbbreviationFinder.py:293).
  */
object AbbreviationFinder {

  final case class Abbreviation(short: String, long: String)

  private val delimiters = List(('(', ')'), ('[', ']'), ('{', '}'), ('<', '>'))

  private def isCandidate(s: String): Boolean =
    s.length >= 2 && s.length <= 10 &&
      s.split("\\s+").length <= 2 &&
      s.exists(_.isLetter) &&
      s.nonEmpty && s.head.isLetterOrDigit

  /** Candidate short forms inside one sentence: (startOffset, text). */
  private def candidates(sentence: String): List[(Int, String)] = {
    val out = mutable.ListBuffer.empty[(Int, String)]
    for ((delStart, delEnd) <- delimiters if sentence.indexOf(delStart) >= 0) {
      // balanced + first open precedes first close, else skip this delimiter
      if (sentence.count(_ == delStart) == sentence.count(_ == delEnd) &&
          sentence.indexOf(delStart) < sentence.indexOf(delEnd)) {
        var closeIndex = -1
        var continue = true
        while (continue) {
          // closeIndex + 1 skips a '(' sitting immediately after the
          // previous ')' — reference parity (AbbreviationFinder.py:134
          // uses find(del_start, closeindex + 1) identically)
          val openIndex = sentence.indexOf(delStart, closeIndex + 1)
          if (openIndex == -1) continue = false
          else {
            var ci = openIndex + 1
            var openCount = 1
            var skip = false
            while (openCount > 0 && !skip) {
              if (ci >= sentence.length) skip = true
              else {
                val ch = sentence(ci)
                if (ch == delStart) openCount += 1
                else if (ch == delEnd) openCount -= 1
                ci += 1
              }
            }
            if (skip) closeIndex = openIndex + 1
            else {
              closeIndex = ci
              val rawStart = openIndex + 1
              val rawStop = ci - 1
              val raw = sentence.substring(rawStart, rawStop)
              val start = rawStart + (raw.length - raw.replaceAll("^\\s+", "").length)
              val stop = rawStop - (raw.length - raw.replaceAll("\\s+$", "").length)
              if (stop > start) {
                val str = sentence.substring(start, stop)
                if (isCandidate(str)) out += ((start, str))
              }
            }
          }
        }
      }
    }
    out.toList
  }

  /** The token window before the candidate that contains enough
    * occurrences of the candidate's first character. */
  private def definitionWindow(candStart: Int, cand: String, sentence: String): Option[String] = {
    if (candStart < 2) return None
    // unconditional -2 assumes "... (" before the candidate — reference
    // parity (AbbreviationFinder.py:180 slices [:candidate.start - 2])
    val before = sentence.substring(0, math.max(0, candStart - 2))
    val tokens = before.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.isEmpty) return None
    val key = cand.head.toLower
    val firstChars = tokens.map(_.head)
    val definitionFreq = firstChars.count(_ == key)
    val candidateFreq = cand.toLowerCase.count(_ == key)
    if (candidateFreq > definitionFreq) return None
    // find the rightmost window start such that the window holds
    // `candidateFreq` tokens starting with the key
    var count = 0
    var startIndex = firstChars.length
    while (count < candidateFreq && startIndex > 0) {
      startIndex -= 1
      if (firstChars(startIndex) == key) count += 1
    }
    if (count < candidateFreq) return None
    // original-cased text: the suffix of `before` spanning the last
    // (tokens.length - startIndex) tokens
    val rawTokens = before.split("\\s+").filter(_.nonEmpty)
    Some(rawTokens.slice(startIndex, rawTokens.length).mkString(" "))
  }

  /** Schwartz–Hearst definition selection: scan right-to-left matching
    * every char of the short form in order; the first char of the short
    * form must begin a token; among valid alignments take the longest;
    * enforce the token-count constraint. */
  private def selectDefinition(definition: String, abbrev: String): Option[String] = {
    if (definition.length < abbrev.length) return None
    if (definition.split("\\s+").contains(abbrev)) return None

    val defLower = definition.toLowerCase
    val abbrLower = abbrev.toLowerCase
    val results = mutable.ListBuffer.empty[String]
    var sIndex = abbrLower.length - 1
    var lIndex = defLower.length - 1
    while (lIndex >= 0) {
      val shortChar = {
        // skip non-alphanumeric short chars
        while (sIndex > 0 && !abbrLower(sIndex).isLetterOrDigit) sIndex -= 1
        abbrLower(sIndex)
      }
      val longChar = defLower(lIndex)
      if (sIndex == 0) {
        if (shortChar == longChar &&
            (lIndex == 0 || !defLower(lIndex - 1).isLetterOrDigit)) {
          results += definition.substring(lIndex)
        }
        lIndex -= 1
      } else {
        if (shortChar == longChar) { sIndex -= 1 }
        lIndex -= 1
      }
    }
    if (results.isEmpty) return None
    val best = results.maxBy(_.length)
    val tokens = best.split("\\s+").count(_.nonEmpty)
    val len = abbrev.length
    if (tokens > math.min(len + 5, len * 2)) None else Some(best)
  }

  /** All (short, long) pairs in a text, sentence by sentence. */
  def find(text: String): List[Abbreviation] = {
    for {
      sent <- BioTokenizer.sentences(text).toList
      (candStart, cand) <- candidates(sent.text)
      window <- definitionWindow(candStart, cand, sent.text).toList
      definition <- selectDefinition(window, cand).toList
    } yield Abbreviation(cand, definition)
  }

  /** First-wins map short → long (reference AbbreviationFinder.py:62-68).
    * Order-preserving (ListMap): the reference's dict keeps insertion
    * order, and expansion replace order matters when one short form is a
    * substring of another (e.g. "FA" / "FAA") — iteration must follow
    * discovery order, not hash order. */
  def findAsMap(text: String): Map[String, String] = {
    val m = mutable.LinkedHashMap.empty[String, String]
    find(text).foreach(a => if (!m.contains(a.short)) m(a.short) = a.long)
    scala.collection.immutable.ListMap(m.toSeq: _*)
  }
}
