package graft.datapipe

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification (builder brief: n-gram heuristic).
  *
  * Two signals, both deterministic and dependency-free:
  *  1. script detection by Unicode block ratios (CJK, Cyrillic, Greek,
  *     Arabic, Devanagari → zh/ru/el/ar/hi immediately);
  *  2. for Latin-script text, scoring against per-language marker sets:
  *     high-frequency function words and characteristic character
  *     n-grams/diacritics for en/de/fr/es/it/pt/nl.
  *
  * Per-row map — no shuffle, trivially parallel at any scale.
  */
object LangId {

  private val markers: Map[String, (Set[String], Set[String])] = Map(
    // language -> (function words, characteristic char sequences)
    "en" -> (Set("the", "and", "of", "to", "in", "is", "that", "for", "with",
      "was", "are", "this", "have", "not", "but", "they", "you", "which"),
      Set("th", "wh", "gh")),
    "de" -> (Set("der", "die", "das", "und", "ist", "nicht", "von", "mit",
      "den", "ein", "eine", "auf", "für", "sich", "dem", "des", "im", "zu"),
      Set("sch", "ä", "ö", "ü", "ß", "ei", "ch")),
    "fr" -> (Set("le", "la", "les", "et", "est", "pas", "des", "une", "dans",
      "que", "qui", "pour", "sur", "avec", "par", "ce", "du", "au"),
      Set("é", "è", "ê", "à", "ç", "oi", "eau", "eux")),
    "es" -> (Set("el", "la", "los", "las", "y", "es", "no", "de", "que", "en",
      "un", "una", "por", "con", "para", "del", "se", "su"),
      Set("ñ", "á", "í", "ó", "ción", "mente")),
    "it" -> (Set("il", "la", "di", "che", "è", "e", "non", "per", "una", "con",
      "sono", "del", "gli", "nel", "alla"),
      Set("zz", "gli", "zione", "à", "ò")),
    "pt" -> (Set("o", "a", "os", "as", "de", "que", "não", "um", "uma", "com",
      "para", "do", "da", "em", "são"),
      Set("ã", "õ", "ção", "nh", "lh")),
    "nl" -> (Set("de", "het", "een", "en", "van", "is", "niet", "dat", "op",
      "zijn", "met", "voor", "aan"),
      Set("ij", "aa", "ee", "oo", "uu")),
  )

  /** Detect language of a text; "und" (undetermined) when no signal. */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var cyr = 0; var greek = 0; var arabic = 0; var deva = 0
    var hangul = 0; var kana = 0; var letters = 0
    text.foreach { c =>
      if (c.isLetter) {
        letters += 1
        val b = Character.UnicodeBlock.of(c)
        if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS) cjk += 1
        else if (b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA) kana += 1
        else if (b == Character.UnicodeBlock.HANGUL_SYLLABLES) hangul += 1
        else if (b == Character.UnicodeBlock.CYRILLIC) cyr += 1
        else if (b == Character.UnicodeBlock.GREEK) greek += 1
        else if (b == Character.UnicodeBlock.ARABIC) arabic += 1
        else if (b == Character.UnicodeBlock.DEVANAGARI) deva += 1
      }
    }
    if (letters == 0) return "und"
    val lf = letters.toDouble
    if (kana / lf > 0.05) return "ja"
    if (cjk / lf > 0.25) return "zh"
    if (hangul / lf > 0.25) return "ko"
    if (cyr / lf > 0.5) return "ru"
    if (greek / lf > 0.5) return "el"
    if (arabic / lf > 0.5) return "ar"
    if (deva / lf > 0.5) return "hi"

    val lower = text.toLowerCase
    val words = lower.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (words.isEmpty) return "und"
    var best = "und"
    var bestScore = 0.0
    markers.foreach { case (lang, (funcWords, grams)) =>
      val wordHits = words.count(funcWords.contains)
      val gramHits = grams.count(lower.contains)
      val score = wordHits.toDouble / words.length + 0.05 * gramHits
      if (score > bestScore + 1e-12) { bestScore = score; best = lang }
    }
    if (bestScore < 0.02) "und" else best
  }

  private val detectUdf = udf((s: String) => detect(s))

  /** doc_id → predicted language. */
  def predict(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), detectUdf(col(textCol)).as("predicted_lang"))
      .orderBy(col(idCol))
}
