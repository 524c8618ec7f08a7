package graft.text

import scala.collection.mutable.ArrayBuffer

/** Token with character offsets into the source text ([start, end)). */
final case class Token(text: String, start: Int, end: Int)

/** Sentence with character offsets into the source document. */
final case class Sentence(text: String, start: Int, end: Int)

/** Whitespace tokenizer that keeps complex biomedical tokens intact —
  * the behavior the reference pins with its custom spaCy infix regex
  * (reference NLP.py:88-115, main.py:525-553) and the tokenizer tests
  * (reference tests/text_nlp.py:377-389, 433-449):
  *
  *  - `10(-7)`, `(Na++K+)-ATPase`, `86Rb+`, `2.7-fold`, `4.5-`,
  *    `th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se` stay single tokens;
  *  - sentence-final/clause punctuation is stripped: `cells,` → `cells`,
  *    `fibroblasts.` → `fibroblasts`, `name:` → `name`;
  *  - unbalanced leading brackets are stripped: `(1` → `1`.
  */
object BioTokenizer {

  private val trailStrip: Set[Char] = Set('.', ',', ';', ':', '!', '?', '"', '\'')
  private val leadStrip: Set[Char] = Set('"', '\'')
  private val open = Map(')' -> '(', ']' -> '[', '}' -> '{')
  private val close = Map('(' -> ')', '[' -> ']', '{' -> '}')

  /** Trim a raw whitespace-delimited chunk to its token form.
    * Returns (startOffsetDelta, token) — empty token means drop. */
  private def trim(raw: String): (Int, String) = {
    var s = 0
    var e = raw.length
    var changed = true
    while (changed && s < e) {
      changed = false
      // trailing sentence punctuation
      while (s < e && trailStrip(raw(e - 1))) { e -= 1; changed = true }
      // leading quotes
      while (s < e && leadStrip(raw(s))) { s += 1; changed = true }
      // unbalanced brackets at the edges: strip a trailing closer with no
      // matching opener inside, or a leading opener with no closer inside
      if (s < e && open.contains(raw(e - 1))) {
        val o = open(raw(e - 1))
        val inner = raw.substring(s, e - 1)
        if (inner.count(_ == o) <= inner.count(_ == raw(e - 1))) { e -= 1; changed = true }
      }
      if (s < e && close.contains(raw(s))) {
        val c = close(raw(s))
        val inner = raw.substring(s + 1, e)
        if (inner.count(_ == c) <= inner.count(_ == raw(s))) { s += 1; changed = true }
      }
    }
    (s, raw.substring(s, e))
  }

  def tokenize(text: String): Vector[Token] = {
    val out = new ArrayBuffer[Token]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(text(i))) i += 1
        val (delta, tok) = trim(text.substring(start, i))
        if (tok.nonEmpty) out += Token(tok, start + delta, start + delta + tok.length)
      }
    }
    out.toVector
  }

  def tokens(text: String): Vector[String] = tokenize(text).map(_.text)

  /** Allocation-light token count (no Token objects) — called from
    * generated code by [[graft.functions.BioTokenCountExpr]] via the
    * static forwarder `graft.text.BioTokenizer.tokenCount`. */
  def tokenCount(text: String): Int = {
    if (text == null) return 0
    var n = 0
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !Character.isWhitespace(text(i))) i += 1
        if (trim(text.substring(start, i))._2.nonEmpty) n += 1
      }
    }
    n
  }

  /** Sentence segmentation: boundary after runs of `.`/`!`/`?` followed by
    * whitespace (reference relies on spaCy sents; its own convention is the
    * `'. '` split at main.py:671-680 — tests pin that `x. y` splits even
    * before a lowercase letter, and bare newlines do NOT split). Periods
    * inside tokens (e.g. `4.5-fold`, `T. aestivum` is split — acceptable
    * deviation) only count when followed by whitespace.
    */
  def sentences(text: String): Vector[Sentence] = {
    val out = new ArrayBuffer[Sentence]
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text(i)
      if ((c == '.' || c == '!' || c == '?') &&
          (i + 1 >= n || Character.isWhitespace(text(i + 1)))) {
        // extend over a punctuation run (e.g. "...")
        var e = i + 1
        val sent = text.substring(start, e)
        if (sent.exists(!Character.isWhitespace(_))) {
          val s0 = start + sent.takeWhile(Character.isWhitespace).length
          out += Sentence(text.substring(s0, e), s0, e)
        }
        while (e < n && Character.isWhitespace(text(e))) e += 1
        start = e
        i = e
      } else i += 1
    }
    if (start < n) {
      val sent = text.substring(start, n)
      if (sent.exists(!Character.isWhitespace(_))) {
        val s0 = start + sent.takeWhile(Character.isWhitespace).length
        var e = n
        while (e > s0 && Character.isWhitespace(text(e - 1))) e -= 1
        out += Sentence(text.substring(s0, e), s0, e)
      }
    }
    out.toVector
  }
}
