package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heuristic language identification (builder brief: n-gram heuristic).
  *
  * Two signals, both deterministic and dependency-free:
  *  1. script detection by Unicode script ratios (Han, kana, Hangul,
  *     Cyrillic, Greek, Arabic, Devanagari → zh/ja/ko/ru/el/ar/hi);
  *  2. for Latin-script text, scoring against per-language marker sets:
  *     high-frequency function words and characteristic character
  *     n-grams/diacritics for en/de/fr/es/it/pt/nl.
  *
  * Fully deterministic: languages are scored in a fixed order with a
  * strict-greater rule (first language reaching the max score wins), so
  * the DuckDB oracle ([[oracleSql]]) reproduces the prediction exactly —
  * scores are the same IEEE-double expression on both engines.
  *
  * Per-row map — no shuffle, trivially parallel at any scale.
  */
object LangId {

  /** (language, function words, characteristic char sequences) in fixed
    * priority order — ties on score resolve to the earlier entry. */
  val markers: Vector[(String, Vector[String], Vector[String])] = Vector(
    ("en", Vector("the", "and", "of", "to", "in", "is", "that", "for", "with",
      "was", "are", "this", "have", "not", "but", "they", "you", "which"),
      Vector("th", "wh", "gh")),
    ("de", Vector("der", "die", "das", "und", "ist", "nicht", "von", "mit",
      "den", "ein", "eine", "auf", "für", "sich", "dem", "des", "im", "zu"),
      Vector("sch", "ä", "ö", "ü", "ß", "ei", "ch")),
    ("fr", Vector("le", "la", "les", "et", "est", "pas", "des", "une", "dans",
      "que", "qui", "pour", "sur", "avec", "par", "ce", "du", "au"),
      Vector("é", "è", "ê", "à", "ç", "oi", "eau", "eux")),
    ("es", Vector("el", "la", "los", "las", "y", "es", "no", "de", "que", "en",
      "un", "una", "por", "con", "para", "del", "se", "su"),
      Vector("ñ", "á", "í", "ó", "ción", "mente")),
    ("it", Vector("il", "la", "di", "che", "è", "e", "non", "per", "una", "con",
      "sono", "del", "gli", "nel", "alla"),
      Vector("zz", "gli", "zione", "à", "ò")),
    ("pt", Vector("o", "a", "os", "as", "de", "que", "não", "um", "uma", "com",
      "para", "do", "da", "em", "são"),
      Vector("ã", "õ", "ção", "nh", "lh")),
    ("nl", Vector("de", "het", "een", "en", "van", "is", "niet", "dat", "op",
      "zijn", "met", "voor", "aan"),
      Vector("ij", "aa", "ee", "oo", "uu")),
  )

  private val markerSets: Vector[(String, Set[String], Vector[String])] =
    markers.map { case (l, ws, gs) => (l, ws.toSet, gs) }

  import java.lang.Character.UnicodeScript

  /** Detect language of a text; "und" (undetermined) when no signal.
    * Scripts via Character.UnicodeScript — the same classification as
    * RE2's \p{Script} classes used by the oracle. */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var han = 0; var cyr = 0; var greek = 0; var arabic = 0; var deva = 0
    var hangul = 0; var kana = 0; var letters = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      if (Character.isLetter(cp)) {
        letters += 1
        val s = UnicodeScript.of(cp)
        if (s == UnicodeScript.HAN) han += 1
        else if (s == UnicodeScript.HIRAGANA || s == UnicodeScript.KATAKANA) kana += 1
        else if (s == UnicodeScript.HANGUL) hangul += 1
        else if (s == UnicodeScript.CYRILLIC) cyr += 1
        else if (s == UnicodeScript.GREEK) greek += 1
        else if (s == UnicodeScript.ARABIC) arabic += 1
        else if (s == UnicodeScript.DEVANAGARI) deva += 1
      }
      ci += Character.charCount(cp)
    }
    if (letters == 0) return "und"
    val lf = letters.toDouble
    if (kana / lf > 0.05) return "ja"
    if (han / lf > 0.25) return "zh"
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
    markerSets.foreach { case (lang, funcWords, grams) =>
      val wordHits = words.count(funcWords.contains)
      val gramHits = grams.count(lower.contains)
      val score = wordHits.toDouble / words.length + 0.05 * gramHits
      if (score > bestScore) { bestScore = score; best = lang }
    }
    if (bestScore < 0.02) "und" else best
  }

  private val detectUdf = udf((s: String) => detect(s))

  /** doc_id → predicted language. */
  def predict(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), detectUdf(col(textCol)).as("predicted_lang"))
      .orderBy(col(idCol))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")

  /** DuckDB SQL computing the identical prediction, generated from the
    * same marker tables (mirrors the q18 generated-stopword-SQL idiom). */
  def oracleSql(idCol: String = "doc_id", textCol: String = "text",
      table: String = "documents"): String = {
    // letters-of-script: strip non-letters first, then non-script —
    // detect() counts codepoints that are BOTH isLetter and in the
    // script (digits/marks carry a script in RE2 but are not letters)
    def scriptLen(cls: String) =
      s"length(regexp_replace(regexp_replace($textCol, '[^\\p{L}]', '', 'g'), '[^$cls]', '', 'g'))"
    val scoreCols = markers.map { case (lang, ws, gs) =>
      val gramSum = gs.map(g =>
        s"(CASE WHEN contains(lt, '${g.replace("'", "''")}') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""CASE WHEN len(words) = 0 THEN 0.0
         |  ELSE CAST(len(list_filter(words, w -> list_contains(${sqlList(ws)}, w))) AS DOUBLE) / len(words)
         |       + 0.05 * ($gramSum) END AS s_$lang""".stripMargin
    }.mkString(",\n    ")
    val langs = markers.map(_._1)
    val greatest = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val firstMax = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString("\n      ")
    s"""WITH base AS (
       |  SELECT $idCol, lower($textCol) AS lt,
       |    length(regexp_replace($textCol, '[^\\p{L}]', '', 'g')) AS letters,
       |    ${scriptLen("\\p{Hiragana}\\p{Katakana}")} AS kana,
       |    ${scriptLen("\\p{Han}")} AS han,
       |    ${scriptLen("\\p{Hangul}")} AS hangul,
       |    ${scriptLen("\\p{Cyrillic}")} AS cyr,
       |    ${scriptLen("\\p{Greek}")} AS grk,
       |    ${scriptLen("\\p{Arabic}")} AS arb,
       |    ${scriptLen("\\p{Devanagari}")} AS deva,
       |    list_filter(string_split_regex(lower($textCol), '[^\\p{L}]+'), w -> w <> '') AS words,
       |    $textCol AS t0
       |  FROM $table
       |), scored AS (
       |  SELECT $idCol, t0, letters, kana, han, hangul, cyr, grk, arb, deva, words,
       |    $scoreCols
       |  FROM base
       |), m AS (
       |  SELECT *, $greatest AS m FROM scored
       |)
       |SELECT $idCol,
       |  CASE
       |    WHEN t0 IS NULL OR t0 = '' THEN 'und'
       |    WHEN letters = 0 THEN 'und'
       |    WHEN CAST(kana AS DOUBLE) / letters > 0.05 THEN 'ja'
       |    WHEN CAST(han AS DOUBLE) / letters > 0.25 THEN 'zh'
       |    WHEN CAST(hangul AS DOUBLE) / letters > 0.25 THEN 'ko'
       |    WHEN CAST(cyr AS DOUBLE) / letters > 0.5 THEN 'ru'
       |    WHEN CAST(grk AS DOUBLE) / letters > 0.5 THEN 'el'
       |    WHEN CAST(arb AS DOUBLE) / letters > 0.5 THEN 'ar'
       |    WHEN CAST(deva AS DOUBLE) / letters > 0.5 THEN 'hi'
       |    WHEN len(words) = 0 THEN 'und'
       |    WHEN m < 0.02 THEN 'und'
       |    ${firstMax}
       |  END AS predicted_lang
       |FROM m ORDER BY $idCol""".stripMargin
  }
}
