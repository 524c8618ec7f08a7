package graft.nlp

import graft.text.Token

/** Coarse rule/lexicon POS tagger (SURVEY §2.9 N3).
  *
  * The reference uses NLTK's PerceptronTagger + spaCy models
  * (reference NLP.py:253-258, 541); no model weights are available
  * offline, so this is a deterministic shape/suffix/lexicon tagger
  * producing the tag set the downstream consumers actually need:
  * the chunker CFG ({NNP, NN, NNI, JJ, IN, DT, CC, CD, VB, PO}) and the
  * tag-POS filter ({NOUN, PROPN, ADJ}). Deviation from model-based
  * tagging documented in SURVEY §7 "hard parts".
  */
object PosTagger {

  val determiners = Set("the", "a", "an", "this", "that", "these", "those",
    "its", "his", "her", "their", "our", "my", "your", "each", "every",
    "some", "any", "no", "such")
  val prepositions = Set("of", "in", "on", "at", "by", "for", "with",
    "from", "into", "during", "including", "until", "against", "among",
    "throughout", "despite", "towards", "toward", "upon", "about", "over",
    "through", "between", "within", "without", "via", "than", "as", "per",
    "across", "under", "after", "before")
  val conjunctions = Set("and", "or", "but", "nor", "yet", "while", "whereas")
  val pronouns = Set("i", "you", "he", "she", "it", "we", "they", "them",
    "him", "us", "me", "who", "which", "whom", "whose", "there")
  val beForms = Set("is", "are", "was", "were", "be", "been", "being", "am")
  val auxiliaries = Set("has", "have", "had", "do", "does", "did", "can",
    "could", "may", "might", "must", "shall", "should", "will", "would")
  val adverbs = Set("not", "n't", "also", "very", "most", "more", "less",
    "least", "significantly", "recently", "presumably", "furthermore",
    "however", "well", "here", "then", "thus", "therefore", "often",
    "likely", "only", "even", "still", "already", "again")

  /** Common verbs (incl. biomedical reporting/relation verbs) in base,
    * -s, -ed, -ing and irregular forms. */
  val verbLexicon = Set(
    "suggest", "suggests", "suggested", "suggesting",
    "perform", "performs", "performed", "performing",
    "evaluate", "evaluates", "evaluated", "evaluating",
    "characterize", "characterizes", "characterized", "characterizing",
    "associate", "associates", "associated", "associating",
    "regulate", "regulates", "regulated", "regulating", "regulating",
    "affect", "affects", "affected", "affecting",
    "induce", "induces", "induced", "inducing",
    "inhibit", "inhibits", "inhibited", "inhibiting",
    "reduce", "reduces", "reduced", "reducing",
    "prevent", "prevents", "prevented", "preventing",
    "cause", "causes", "caused", "causing",
    "result", "results", "resulted", "resulting",
    "identify", "identifies", "identified", "identifying",
    "observe", "observes", "observed", "observing",
    "find", "finds", "found", "finding",
    "show", "shows", "showed", "shown", "showing",
    "report", "reports", "reported", "reporting",
    "describe", "describes", "described", "describing",
    "contribute", "contributes", "contributed", "contributing",
    "consider", "considers", "considered", "considering",
    "establish", "establishes", "established", "establishing",
    "increase", "increases", "increased", "increasing",
    "decrease", "decreases", "decreased", "decreasing",
    "locate", "locates", "located", "locating",
    "express", "expresses", "expressed", "expressing",
    "involve", "involves", "involved", "involving",
    "require", "requires", "required", "requiring",
    "demonstrate", "demonstrates", "demonstrated", "demonstrating",
    "indicate", "indicates", "indicated", "indicating",
    "confirm", "confirms", "confirmed", "confirming",
    "compare", "compares", "compared", "comparing",
    "measure", "measures", "measured", "measuring",
    "analyze", "analyzes", "analyzed", "analyzing",
    "discuss", "discusses", "discussed", "discussing",
    "finish", "finishes", "finished", "finishing",
    "begin", "begins", "began", "begun", "beginning",
    "receive", "receives", "received", "receiving",
    "defeat", "defeats", "defeated", "defeating",
    "win", "wins", "won", "winning",
    "name", "named", "names", "naming",
    "mediate", "mediates", "mediated", "mediating",
    "encode", "encodes", "encoded", "encoding",
    "modify", "modifies", "modified", "modifying",
    "improve", "improves", "improved", "improving",
    "represent", "represents", "represented", "representing",
    "remain", "remains", "remained", "remaining",
    "think", "thinks", "thought", "thinking",
    "know", "knows", "known", "knowing",
    "use", "uses", "used", "using",
    "enroll", "enrolls", "enrolled", "enrolling",
  )

  val nounSuffixes = Seq("tion", "sion", "ment", "ness", "ity", "ism",
    "osis", "emia", "itis", "oma", "ase", "ome", "ance", "ence", "ure",
    "age", "ist", "or", "er", "cy")
  val adjSuffixes = Seq("ic", "al", "ous", "ive", "ar", "ary", "able",
    "ible", "ful", "less", "like", "positive", "negative", "related",
    "dependent", "specific", "sensitive", "containing", "coding", "fold")

  /** Comparative adjectives relevant to the copula patterns. */
  val comparatives = Set("higher", "lower", "greater", "larger", "smaller",
    "better", "worse", "longer", "shorter", "stronger", "weaker", "older",
    "younger", "elevated", "important", "essential", "similar", "different",
    "difficult", "likely", "present", "absent", "common", "rare")

  /** Simple coarse tags. VB covers all verb forms; VBN marks -ed/-en
    * participles (needed by the "be X-ed by" pattern). */
  sealed trait Tag
  case object NNP extends Tag
  case object NN extends Tag
  case object JJ extends Tag
  case object VB extends Tag
  case object VBN extends Tag
  case object IN extends Tag
  case object DT extends Tag
  case object CC extends Tag
  case object CD extends Tag
  case object RB extends Tag
  case object PRP extends Tag
  case object TO extends Tag
  case object THAT extends Tag
  case object OTHER extends Tag

  final case class Tagged(token: Token, tag: Tag)

  private def looksProper(w: String): Boolean = {
    // Capitalized, ALLCAPS (gene symbols), or letter+digit mixes: PLK1, TTF-1
    (w.head.isUpper && w.exists(_.isLower)) ||
      (w.length > 1 && w.forall(c => c.isUpper || c.isDigit || c == '-')) ||
      (w.exists(_.isDigit) && w.exists(_.isLetter))
  }

  def tagWord(word: String, isSentenceInitial: Boolean): Tag = {
    val w = word
    val lw = w.toLowerCase
    if (lw == "to") return TO
    if (lw == "that") return THAT
    if (determiners(lw)) return DT
    if (prepositions(lw)) return IN
    if (conjunctions(lw)) return CC
    if (pronouns(lw)) return PRP
    if (beForms(lw)) return VB
    if (auxiliaries(lw)) return VB
    if (adverbs(lw) || (lw.endsWith("ly") && lw.length > 3)) return RB
    if (w.forall(c => c.isDigit || c == '.' || c == ',' || c == '%')) return CD
    if (verbLexicon(lw))
      return if (lw.endsWith("ed") || lw.endsWith("en") || lw == "shown" ||
        lw == "found" || lw == "thought" || lw == "known") VBN else VB
    if (comparatives(lw)) return JJ
    // statistical/appositive fragments never join noun phrases:
    // fully-parenthesized tokens "(FA)", comparisons "p<0.05"
    if (w.startsWith("(") && w.endsWith(")")) return OTHER
    if (w.exists(c => c == '<' || c == '>' || c == '=')) return CD
    if (adjSuffixes.exists(sfx => lw.endsWith(sfx)) && lw.length > 4) return JJ
    if (!isSentenceInitial && looksProper(w)) return NNP
    if (isSentenceInitial && w.head.isUpper &&
        (w.drop(1).exists(_.isUpper) || w.exists(_.isDigit))) return NNP
    if (nounSuffixes.exists(sfx => lw.endsWith(sfx)) && lw.length > 4) return NN
    if (lw.endsWith("ing") && lw.length > 5) return VB // gerunds default verbal
    // hyphenated -ed compounds are adjectives (brain-enriched, age-related)
    if (lw.contains('-') && lw.endsWith("ed")) return JJ
    if (lw.endsWith("ed") && lw.length > 4 && !lw.endsWith("eed")) return VBN
    NN
  }

  /** Tag a tokenized sentence. Sentence-initial capitalization is not
    * treated as proper-noun evidence unless the word has inner caps —
    * but a sentence-initial word that would otherwise be NN keeps its
    * original-case text for NP output (the goldens expect "Asthma"). */
  def tag(tokens: Vector[Token]): Vector[Tagged] =
    tokens.zipWithIndex.map { case (t, i) =>
      Tagged(t, tagWord(t.text, i == 0))
    }
}
