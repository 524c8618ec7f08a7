package graft.text

import scala.io.Source

/** Stop-word / common-word lists used by the tagger and NLP filters.
  *
  * Data provenance (lists are public data, shipped as resources):
  *  - glasgow_stop_words.txt — Glasgow IR Group English stop words
  *    (ir.dcs.gla.ac.uk), the list the reference embeds at
  *    reference NLP.py:14-55.
  *  - domain_stop_words.txt — biomedical domain stop words, reference
  *    BioStopWords.py:2 (DOMAIN_STOP_WORDS).
  *  - brown_common_words.txt — common-English word list (Brown corpus
  *    vocabulary), reference BioStopWords.py:796, used by the
  *    short/common-word tag filter (reference NLP.py:622-641).
  *  - es_english_stopwords.txt — the 768-entry custom stopword list of
  *    the reference's `english_stop` filter, extracted verbatim from
  *    reference es-mapping/publication.json:9-780; drives the search
  *    analyzer (SearchFacade.analyzeEnglish) for token-level parity
  *    with the ES `english` analyzer.
  */
object StopWords {
  private def load(name: String): Set[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource /graft/$name")
    try Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toSet
    finally in.close()
  }

  lazy val glasgow: Set[String] = load("glasgow_stop_words.txt")
  lazy val esEnglish: Set[String] = load("es_english_stopwords.txt")
  lazy val domain: Set[String] = load("domain_stop_words.txt")
  lazy val brownCommon: Set[String] = load("brown_common_words.txt")

  /** Punctuation "symbols" filtered from token streams (reference NLP.py:137). */
  val symbols: Set[String] =
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".map(_.toString).toSet ++
      Set("-----", "---", "...", "'ve")

  /** NLTK-English + extras + Glasgow + domain + punctuation — the
    * document-analysis stopword set (reference NLP.py:504-506). We use
    * Glasgow as the English base (NLTK's list is a subset shape). */
  lazy val documentAnalysis: Set[String] =
    glasgow ++ Set("n't", "'s", "'m", "ca", "p", "t") ++ domain ++
      "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".map(_.toString).toSet
}
