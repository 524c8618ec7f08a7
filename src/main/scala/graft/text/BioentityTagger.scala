package graft.text

import scala.collection.mutable

/** A dictionary match in a text. Offsets are [start, end) character
  * positions (reference BioentityTagger.py:287-307, MatchedTag).
  */
final case class MatchedTag(
    matchText: String,
    start: Int,
    end: Int,
    category: String,
    referenceDb: String,
    reference: String,
    originalValue: String,
    label: String,
    sentence: Option[Int] = None,
)

/** One vocabulary dictionary: CATEGORY-REFERENCEDB plus surface-form map
  * (reference BioentityTagger.py:55-59; shape
  * `{surface: {ids: [...], pref_name}}`, filename encodes category).
  */
final case class Vocabulary(
    category: String,
    referenceDb: String,
    entries: Map[String, VocabEntry],
)
final case class VocabEntry(ids: Seq[String], prefName: String)

/** Payload on an automaton word: parallel category/refDb/ids lists merged
  * across vocabularies that share a surface form (reference
  * BioentityTagger.py:106-133, add_tag).
  */
final case class TagPayload(
    categories: List[String],
    referenceDbs: List[String],
    ids: List[String],
    originalValue: String,
    matchForm: String,
    prefName: String,
) extends Serializable

/** Dictionary tagging engine — the reference's hottest operator
  * (SURVEY.md §2.8; reference BioentityTagger.py:19-284).
  *
  * Build rules reproduced: surface forms ≥3 chars; stopword gate is
  * case-sensitive for <5 chars and lowercased for ≥5; lowercased entries
  * when ignorecase; dash-stripped duplicate surface forms; multi-category
  * payload merge keyed by category|reference_db.
  *
  * Probe rules reproduced: match accepted only on word boundaries
  * (separator chars on both sides); per category|reference_db group,
  * nested spans removed keeping outermost.
  *
  * Spark usage: build once on the driver, `broadcast`, probe inside
  * `mapPartitions` — the map-side broadcast-dictionary join (SURVEY §2.3
  * J1). The automaton is immutable and thread-safe after build.
  */
final class BioentityTagger private (
    val automaton: AhoCorasick[TagPayload],
    val ignoreCase: Boolean,
) extends Serializable {

  import BioentityTagger._

  def tag(text: String): List[MatchedTag] = {
    val t = if (ignoreCase) text.toLowerCase else text
    val matches = mutable.ArrayBuffer.empty[MatchedTag]
    automaton.scan(t) { (endEx, len, payload) =>
      val start = endEx - len
      val boundedLeft = start == 0 || separators(t.charAt(start - 1))
      val boundedRight = endEx == t.length || separators(t.charAt(endEx))
      if (boundedLeft && boundedRight) {
        var j = 0
        while (j < payload.categories.length) {
          val category = payload.categories(j)
          if (category.endsWith("-TOKEN")) {
            // partial match: single indexed token of a multi-token
            // surface; accept only if the surrounding text fuzzily
            // matches the full surface (reference BioentityTagger.py:
            // 170-177, fuzz.token_sort_ratio > 90)
            val original = if (ignoreCase) payload.originalValue.toLowerCase
              else payload.originalValue
            val post = original.split(java.util.regex.Pattern.quote(payload.matchForm), 2) match {
              case Array(_, p) => p
              case _ => ""
            }
            val window = t.substring(start, math.min(endEx + post.length, t.length))
            if (BioentityTagger.tokenSortRatio(original, window) > 90) {
              matches += MatchedTag(
                matchText = payload.matchForm, start = start, end = endEx,
                category = category.stripSuffix("-TOKEN"),
                referenceDb = payload.referenceDbs(j),
                reference = payload.ids(j),
                originalValue = payload.originalValue,
                label = payload.prefName)
            }
          } else {
            matches += MatchedTag(
              matchText = payload.matchForm,
              start = start,
              end = endEx,
              category = category,
              referenceDb = payload.referenceDbs(j),
              reference = payload.ids(j),
              originalValue = payload.originalValue,
              label = payload.prefName)
          }
          j += 1
        }
      }
    }
    groupByCategoryAndReference(matches.toList).valuesIterator
      .flatMap(removeNested).toList
      .sortBy(tg => (tg.start, -tg.end))
  }

  /** Tags fully inside [start, end] (reference BioentityTagger.py:254-264;
    * note the reference's early `break` assumes end-sorted input — we scan
    * all, which is strictly more correct). */
  def tagsInRange(tags: Seq[MatchedTag], start: Int, end: Int): Seq[MatchedTag] =
    tags.filter(t => start <= t.start && t.start <= end && start <= t.end && t.end <= end)
}

object BioentityTagger {

  /** Word-boundary separators (reference BioentityTagger.py:20-21). */
  val separators: Set[Char] = Set(' ', '.', ',', ';', ':', ')', ']', '(', '[',
    '{', '}', '/', '\\', '"', '\'', '?', '!', '<', '>', '+', '-')

  /** fuzzywuzzy-style token_sort_ratio: sort whitespace tokens, join,
    * similarity ratio 0..100 = 2·LCS/(|a|+|b|)·100 (difflib's 2M/T with
    * LCS as the match count — equal for the sorted-token strings this
    * gate compares). */
  def tokenSortRatio(a: String, b: String): Int = {
    def sortTokens(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    val x = sortTokens(a)
    val y = sortTokens(b)
    if (x.isEmpty && y.isEmpty) return 100
    // LCS length, O(|x|·|y|) with two rows
    var prev = new Array[Int](y.length + 1)
    var cur = new Array[Int](y.length + 1)
    var i = 1
    while (i <= x.length) {
      var j = 1
      while (j <= y.length) {
        cur(j) = if (x(i - 1) == y(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    math.round(200.0 * prev(y.length) / (x.length + y.length)).toInt
  }

  def build(
      vocabularies: Seq[Vocabulary],
      ignoreCase: Boolean = true,
      stopwords: Set[String] = null,
      partialMatch: Boolean = false,
  ): BioentityTagger = {
    val stops = Option(stopwords).getOrElse(StopWords.domain)
    val b = AhoCorasick.builder[TagPayload]
    // Reference parity (BioentityTagger.py:125-133 add_tag): only
    // categories/referenceDbs/ids extend on a duplicate surface; the
    // first insertion's originalValue/matchForm/prefName are kept —
    // the reference leaves previous_annotation[4..6] untouched too.
    def merge(prev: TagPayload, add: TagPayload): TagPayload = {
      val prevKeys = prev.categories.zip(prev.referenceDbs).map { case (c, r) => s"$c|$r" }.toSet
      val key = s"${add.categories.head}|${add.referenceDbs.head}"
      if (prevKeys.contains(key)) prev
      else prev.copy(
        categories = prev.categories ++ add.categories,
        referenceDbs = prev.referenceDbs ++ add.referenceDbs,
        ids = prev.ids ++ add.ids)
    }
    for (vocab <- vocabularies; (surface, entry) <- vocab.entries) {
      if (surface.length > 2) {
        val passesStopGate =
          (surface.length < 5 && !stops.contains(surface)) ||
            (surface.length >= 5 && !stops.contains(surface.toLowerCase))
        if (passesStopGate) {
          val matchForm = if (ignoreCase) surface.toLowerCase else surface
          val firstId = entry.ids.headOption.getOrElse("")
          def payload(m: String) = TagPayload(
            categories = List(vocab.category),
            referenceDbs = List(vocab.referenceDb),
            ids = List(firstId),
            originalValue = surface,
            matchForm = m,
            prefName = entry.prefName)
          b.add(matchForm, payload(matchForm), merge)
          if (matchForm.contains('-')) {
            val noDash = matchForm.replace("-", "")
            if (noDash.length > 2) b.add(noDash, payload(noDash), merge)
          }
          // partial-match: index each long token of a multi-token
          // surface as CATEGORY-TOKEN (reference BioentityTagger.py:89-101)
          if (partialMatch) {
            surface.split("\\s+").foreach { tok =>
              if (tok != surface && tok.length > 5 && !stops.contains(tok.toLowerCase)) {
                val tm = if (ignoreCase) tok.toLowerCase else tok
                b.add(tm, TagPayload(
                  categories = List(vocab.category + "-TOKEN"),
                  referenceDbs = List(vocab.referenceDb),
                  ids = List(firstId),
                  originalValue = surface,
                  matchForm = tm,
                  prefName = entry.prefName), merge)
              }
            }
          }
        }
      }
    }
    new BioentityTagger(b.build(), ignoreCase)
  }

  def groupByCategoryAndReference(
      matches: Seq[MatchedTag]): Map[String, Seq[MatchedTag]] =
    matches.groupBy(m => s"${m.category}|${m.referenceDb}")

  /** Keep only outermost spans within a group (reference
    * BioentityTagger.py:205-223): drop a tag fully contained in another. */
  def removeNested(matches: Seq[MatchedTag]): Seq[MatchedTag] = {
    val sorted = matches.sortBy(t => (t.start, -t.end)).toIndexedSeq
    sorted.zipWithIndex.filter { case (ti, i) =>
      !sorted.zipWithIndex.exists { case (tj, j) =>
        i != j && tj.start <= ti.start && ti.end <= tj.end &&
          // identical spans: keep the first occurrence only
          (tj.start < ti.start || tj.end > ti.end || j < i)
      }
    }.map(_._1)
  }

  /** Insert `<mark-N ...>` markup at tag offsets (reference
    * BioentityTagger.py:225-252, mark_tags_in_text). Builds right-to-left
    * so earlier offsets stay valid.
    */
  def markTagsInText(text: String, matches: Seq[MatchedTag]): String = {
    val sorted = matches.sortBy(t => (t.start, -t.end)).zipWithIndex
    // Equal-offset inserts land in tag-addition order — the same order
    // the reference's ChangeCollector applies them, INCLUDING the
    // crossed close-tags two overlapping same-end tags produce
    // (BioentityTagger.py:240-249; parity, not a bug).
    // collect insertions as (position, orderKey, text); apply descending
    val inserts = sorted.flatMap { case (t, i) =>
      val openTag = s"""<mark-$i data-entity="${t.category}" reference-db="${t.referenceDb}"  reference="${t.reference}">"""
      Seq((t.start, 2L * i, openTag), (t.end, 2L * i + 1, s"</mark-$i>"))
    }
    val sb = new StringBuilder(text)
    inserts.sortBy { case (pos, key, _) => (-pos, -key) }.foreach {
      case (pos, _, ins) => sb.insert(pos, ins)
    }
    s"""<div  class="entities">${sb.toString}</div></br>"""
  }

  /** Strip all Unicode punctuation (reference BioentityTagger.py:309-316). */
  def sanitizeString(s: String): String =
    s.filterNot(c => {
      val t = Character.getType(c)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION ||
        t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
    })
}
