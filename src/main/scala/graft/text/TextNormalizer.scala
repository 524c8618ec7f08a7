package graft.text

import java.text.Normalizer

/** Unicode → ASCII normalization for abstracts (reference NLP.py:164-223,
  * AbstractNormalizer):
  *  1. Greek letters → spelled-out Latin names (48-entry table),
  *  2. whitespace-run squash,
  *  3. ASCII transliteration (unidecode approximation via NFKD +
  *     combining-mark strip; unmappable chars dropped).
  */
object TextNormalizer {

  /** Greek letter → Latin name (NLP.py:165-214; note "Lamda" spelling and
    * missing final-sigma ς, reproduced deliberately). */
  val greekAlphabet: Map[Char, String] = Map(
    'Α' -> "Alpha", 'Β' -> "Beta", 'Γ' -> "Gamma",
    'Δ' -> "Delta", 'Ε' -> "Epsilon", 'Ζ' -> "Zeta",
    'Η' -> "Eta", 'Θ' -> "Theta", 'Ι' -> "Iota",
    'Κ' -> "Kappa", 'Λ' -> "Lamda", 'Μ' -> "Mu",
    'Ν' -> "Nu", 'Ξ' -> "Xi", 'Ο' -> "Omicron",
    'Π' -> "Pi", 'Ρ' -> "Rho", 'Σ' -> "Sigma",
    'Τ' -> "Tau", 'Υ' -> "Upsilon", 'Φ' -> "Phi",
    'Χ' -> "Chi", 'Ψ' -> "Psi", 'Ω' -> "Omega",
    'α' -> "alpha", 'β' -> "beta", 'γ' -> "gamma",
    'δ' -> "delta", 'ε' -> "epsilon", 'ζ' -> "zeta",
    'η' -> "eta", 'θ' -> "theta", 'ι' -> "iota",
    'κ' -> "kappa", 'λ' -> "lamda", 'μ' -> "mu",
    'ν' -> "nu", 'ξ' -> "xi", 'ο' -> "omicron",
    'π' -> "pi", 'ρ' -> "rho", 'σ' -> "sigma",
    'τ' -> "tau", 'υ' -> "upsilon", 'φ' -> "phi",
    'χ' -> "chi", 'ψ' -> "psi", 'ω' -> "omega",
  )

  /** A few transliterations NFKD cannot produce but unidecode does, for
    * characters common in MEDLINE abstracts. */
  private val extraTranslit: Map[Char, String] = Map(
    'ß' -> "ss", // ß
    'æ' -> "ae", 'Æ' -> "AE",
    'œ' -> "oe", 'Œ' -> "OE",
    'ø' -> "o", 'Ø' -> "O",
    'đ' -> "d", 'Đ' -> "D",
    'ł' -> "l", 'Ł' -> "L",
    '‘' -> "'", '’' -> "'", '“' -> "\"", '”' -> "\"",
    '–' -> "-", '—' -> "-", '−' -> "-",
    '°' -> "deg", 'µ' -> "u",
    '…' -> "...",
    '×' -> "x", '÷' -> "/",
    ' ' -> " ",
  )

  def transliterateGreek(text: String): String = {
    if (!text.exists(greekAlphabet.contains)) text
    else {
      val sb = new StringBuilder(text.length + 16)
      text.foreach { c => greekAlphabet.get(c) match {
        case Some(n) => sb.append(n)
        case None => sb.append(c)
      }}
      sb.toString
    }
  }

  /** ASCII-fold: NFKD decomposition, drop combining marks, apply the
    * extra transliteration table, drop anything still non-ASCII. */
  def asciiFold(text: String): String = {
    if (text.forall(_ < 128)) return text
    val pre = {
      val sb = new StringBuilder(text.length)
      text.foreach { c => extraTranslit.get(c) match {
        case Some(r) => sb.append(r)
        case None => sb.append(c)
      }}
      sb.toString
    }
    val decomposed = Normalizer.normalize(pre, Normalizer.Form.NFKD)
    decomposed.filter(c => c < 128)
  }

  /** Full normalize: greek → names, squash whitespace runs of 2+ to one
    * space, ASCII-fold. Mirrors AbstractNormalizer.normalize semantics
    * (NLP.py:216-223). */
  def normalize(text: String): String =
    asciiFold(transliterateGreek(text).replaceAll("\\s\\s+", " "))
}
