package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.StopWords

/** The reference's query surface, Spark-native (SURVEY §3.3): the ES
  * mappings define full-text search (english analyzer), keyword/date
  * filters, and the LINK adjacency-matrix co-occurrence aggregation
  * (reference es-mapping/publication.json:5-808, README.md:96-104).
  *
  * Here: an `english analyzer` built from composable Spark built-ins
  * (lowercase → ASCII-ish fold → tokenize → stopword removal → minimal
  * stemming), searchable token arrays + `array_contains` predicates,
  * and co-occurrence as explode + groupBy over the precomputed
  * `relations` strings.
  *
  * Scale: analysis is per-row codegen; search predicates on token
  * arrays are scans (at real scale, persist the tokenized column and
  * Z-order/bucket by high-selectivity keys; an inverted-index table is
  * the rule-based upgrade path noted in SURVEY §4).
  */
object SearchFacade {

  /** english-analyzed token array for a text column, mirroring the
    * reference's `english` analyzer (es-mapping/publication.json:782-808:
    * classic tokenizer → icu_normalizer → english_possessive_stemmer →
    * english_stop → english_minimal_stemmer) with TABLE-LEVEL parity:
    *  - stopwords: the mapping's exact 768-entry english_stop list
    *    (es-mapping/publication.json:9-780), verbatim resource;
    *  - minimal_english: Lucene's EnglishMinimalStemmer rules EXACTLY
    *    (see [[minimalEnglishStem]]) — including its quirks
    *    ("classes" → "classe", "boxes" → "boxe");
    *  - possessive_english: strip trailing 's with any of the three
    *    apostrophes Lucene's EnglishPossessiveFilter accepts.
    * Documented DEVIATIONS (SearchAnalyzerParitySpec pins all of this):
    *  - tokenizer: split on non-letter/digit instead of Lucene
    *    `classic` (classic keeps interior apostrophes, dotted acronyms
    *    and hostnames as single tokens — so the mapping's apostrophe
    *    stopwords 'll/'ve can never match here);
    *  - icu_normalizer: approximated by lower() (full NFKC case-fold
    *    differs only on non-ASCII compatibility chars).
    * Pure built-ins — fully codegen'd. */
  def analyzeEnglish(text: Column): Column = {
    // stopword test as In(768 literals): the optimizer rewrites it to a
    // hashed InSet (O(1) per token) — array_contains over a literal
    // array would scan the whole list per token
    val stopList = StopWords.esEnglish.toSeq.sorted
    val toks = split(regexp_replace(lower(text), "['’＇]s\\b", ""),
      "[^\\p{L}\\p{N}]+")
    val filtered = filter(toks, t =>
      length(t) > 0 && !t.isin(stopList: _*))
    transform(filtered, t => minimalEnglishStem(t))
  }

  /** Lucene EnglishMinimalStemmer (the ES `minimal_english` filter),
    * rule-for-rule: tokens shorter than 3 or not ending in s are kept;
    * -us/-ss are kept; -ies → -y when preceded by a letter other than
    * a/e; other -[iaoe]es are kept; anything else drops the final s
    * (which is how Lucene really behaves on "classes" → "classe"). */
  def minimalEnglishStem(t: Column): Column =
    when(length(t) < 3 || !t.rlike("s$"), t)
      .when(t.rlike("(us|ss)$"), t)
      .when(t.rlike("[^ae]ies$"), regexp_replace(t, "ies$", "y"))
      .when(t.rlike("[iaoe]es$"), t)
      .otherwise(t.substr(lit(1), length(t) - 1))

  /** String twin of [[minimalEnglishStem]] for driver-side query terms;
    * SearchAnalyzerParitySpec pins the two to agree token-by-token. */
  def minimalEnglishStemStr(t: String): String = {
    val len = t.length
    if (len < 3 || t.charAt(len - 1) != 's') t
    else t.charAt(len - 2) match {
      case 'u' | 's' => t
      case 'e' =>
        if (len > 3 && t.charAt(len - 3) == 'i' &&
            t.charAt(len - 4) != 'a' && t.charAt(len - 4) != 'e')
          t.substring(0, len - 3) + "y"
        else if ("iaoe".indexOf(t.charAt(len - 3)) >= 0) t
        else t.substring(0, len - 1)
      case _ => t.substring(0, len - 1)
    }
  }

  /** Add a `tokens` column with the analyzed text. */
  def withSearchTokens(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("tokens", analyzeEnglish(col(textCol)))

  /** Full-text term predicate: all query terms present (AND semantics). */
  def matchAll(tokensCol: Column, query: String): Column = {
    val qToks = query.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    qToks.map(t => array_contains(tokensCol, t)).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Any-term predicate (OR semantics). */
  def matchAny(tokensCol: Column, query: String): Column = {
    val qToks = query.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    qToks.map(t => array_contains(tokensCol, t)).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Phrase predicate (ES match_phrase analog): the analyzed query
    * terms appear consecutively in the token array. Same caveat as ES:
    * positions are post-stopword-removal. Pure higher-order functions —
    * no UDF. */
  def matchPhrase(tokensCol: Column, phrase: String): Column = {
    val q = phrase.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    if (q.isEmpty) lit(true)
    else if (q.length == 1) array_contains(tokensCol, q.head)
    else {
      val qArr = array(q.map(lit).toIndexedSeq: _*)
      val m = q.length
      // Floor the window-start range at 1: for a doc with fewer than m
      // tokens the end would be <= 0 and sequence(1, 0) expands as the
      // DESCENDING [1, 0], feeding slice() an invalid start of 0. With
      // end = 1, slice(tokens, 1, m) on a too-short array yields fewer
      // than m elements and compares unequal to qArr — correct false.
      size(filter(
        sequence(lit(1), greatest(size(tokensCol) - (m - 1), lit(1))),
        i => slice(tokensCol, i, lit(m)) === qArr)) > 0
    }
  }

  /** TF-IDF ranked search (the ES relevance-scoring analog): documents
    * filtered to any-term matches, scored by Σ_t tf(t,d)·idf(t) with
    * idf(t) = ln((N+1)/(df_t+1)). Document frequencies for the (few)
    * query terms are computed in one aggregate and folded in as
    * literals — no second shuffle, no UDF; the score is a codegen'd
    * per-row expression and top-k lands in TakeOrderedAndProject. */
  def searchRanked(df: DataFrame, idCol: String, textCol: String,
      query: String, k: Int = 10): DataFrame = {
    val qToks = query.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).distinct
    require(qToks.nonEmpty, "empty query")
    val tokens = withSearchTokens(df, textCol)
    val n = tokens.count()
    val dfCounts: Map[String, Long] = tokens
      .select(explode(array_distinct(col("tokens"))).as("t"))
      .filter(col("t").isin(qToks.toIndexedSeq: _*))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val score = qToks.map { t =>
      val idf = math.log((n + 1.0) / (dfCounts.getOrElse(t, 0L) + 1.0))
      size(filter(col("tokens"), x => x === lit(t))).cast("double") * lit(idf)
    }.reduce(_ + _)
    tokens
      .filter(matchAny(col("tokens"), query))
      .withColumn("score", score)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BM25 ranked search — the scorer ES actually uses (Okapi BM25 with
    * k1=1.2, b=0.75 is the ES default similarity), completing the
    * relevance-scoring parity beyond [[searchRanked]]'s classic TF-IDF.
    *
    * Corpus statistics (N, Σdl, per-term df) are two small aggregates
    * collected to the driver and folded into the scoring expression as
    * literals — same shape as [[searchRanked]]: no second shuffle, the
    * score is a codegen'd per-row expression, top-k lands in
    * TakeOrderedAndProject.
    *
    * Output carries rank + integer columns, NOT the float score: `ln`
    * is not bit-portable across engines (measured: 7/35000 inputs
    * differ between Java's Math.log and glibc/DuckDB ln), but the
    * ORDER is — documents with identical integer (tf…, dl) tie exactly
    * (same expression, same doubles, doc-id tiebreak) and documents
    * with different inputs are separated by far more than an ulp. */
  def searchBm25(df: DataFrame, idCol: String, textCol: String,
      query: String, k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = analyzeQueryTerms(query).distinct
    require(terms.nonEmpty, "query analyzed to zero terms")
    // Par.ensure: the analyzer dominates; don't serialize it on
    // single-split inputs. Corpus stats (N, Σdl, every per-term df) in
    // ONE aggregate pass — the analyzer is the cost, so one pass for
    // all statistics instead of one for (N, Σdl) plus an explode for df
    val toks = withSearchTokens(graft.util.Par.ensure(df), textCol)
      .select(col(idCol), col("tokens"), size(col("tokens")).as("dl"))
    val aggCols = Seq(count(lit(1)), sum(col("dl"))) ++
      terms.map(t => sum(when(array_contains(col("tokens"), t), 1L)
        .otherwise(0L)))
    val stats = toks.agg(aggCols.head, aggCols.tail: _*).head()
    val n = stats.getLong(0)
    // empty corpus (or all-null text): no document can match — return
    // an empty frame with the output schema instead of NPE/NaN stats
    if (n == 0 || stats.isNullAt(1))
      return toks.filter(lit(false))
        .select(lit(0L).as("rank"), col(idCol), col("dl"))
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val dfCounts: Map[String, Long] =
      terms.zipWithIndex.map { case (t, i) => t -> stats.getLong(2 + i) }.toMap
    val score = terms.map { t =>
      val dft = dfCounts.getOrElse(t, 0L)
      val idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
      val tf = size(filter(col("tokens"), x => x === lit(t))).cast("double")
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
    }.reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    toks
      .filter(matchAny(col("tokens"), terms.mkString(" ")))
      .withColumn("__score", score)
      .orderBy(col("__score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("dl"), col("__score"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("__score").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("dl"))
  }

  /** LINK-style co-occurrence over the concepts collection (SURVEY §2.3
    * J4): explode the precomputed `relations.undirected` pair strings,
    * filter to the entities of interest (≤ `maxFilters`, mirroring ES's
    * max_adjacency_matrix_filters=500), count per pair. */
  def coOccurrence(concepts: DataFrame, entities: Seq[String],
      maxFilters: Int = 500): DataFrame = {
    require(entities.size <= maxFilters,
      s"too many co-occurrence filters (${entities.size} > $maxFilters)")
    val entArr = array(entities.map(lit): _*)
    concepts
      .select(col("pub_id"), explode(col("relations.undirected")).as("pair"))
      .withColumn("a", substring_index(col("pair"), "|", 1))
      .withColumn("b", substring_index(col("pair"), "|", -1))
      .filter(array_contains(entArr, col("a")) && array_contains(entArr, col("b")))
      .groupBy(col("a"), col("b"))
      .agg(countDistinct(col("pub_id")).as("n_publications"), count(lit(1)).as("n_concepts"))
      .orderBy(col("n_publications").desc, col("a"), col("b"))
  }

  /** Entity-level co-occurrence from the bioentities collection: tag
    * pairs within the same publication (SURVEY §2.3 J4 alternative).
    * Collect-per-publication + in-map pair expansion — one shuffle of
    * the tag rows, not a self-join (see ArrayPairs). */
  def entityCoOccurrence(bioentities: DataFrame): DataFrame = {
    val tags = bioentities
      .select(col("pub_id"), explode(col("entities")).as("e"))
      .select(col("pub_id"), col("e.reference").as("ref"))
      .distinct()
    tags.groupBy(col("pub_id"))
      .agg(collect_list(col("ref")).as("refs"))
      .select(explode(graft.functions.ArrayPairs.orderedPairs(col("refs"))).as("pr"))
      .filter(col("pr._1") < col("pr._2"))
      .groupBy(col("pr._1").as("ref"), col("pr._2").as("ref2"))
      .agg(count(lit(1)).as("n_publications"))
      .orderBy(col("n_publications").desc, col("ref"), col("ref2"))
  }

  /** Scala mirror of [[analyzeEnglish]] for driver-side query strings —
    * same regexes and rule order, so an analyzed query term matches the
    * analyzed document tokens. Kept adjacent to the column version;
    * SearchFacadeSpec pins their agreement. */
  def analyzeQueryTerms(query: String): Seq[String] =
    query.toLowerCase.replaceAll("['’＇]s\\b", "")
      .split("[^\\p{L}\\p{N}]+").toIndexedSeq
      .filter(_.nonEmpty)
      .filterNot(StopWords.esEnglish.contains)
      .map(minimalEnglishStemStr)

  /** Inverted index over a document table: one (term, id) posting per
    * distinct analyzed token per document — the scale path for the
    * search predicates above (SURVEY §3.3 / §4): materialized once and
    * partitioned (or bucketed) by term, a conjunctive query reads only
    * its terms' postings instead of scanning every document's text. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withSearchTokens(df, textCol)
      .select(col(idCol), explode(col("tokens")).as("term"))
      .distinct()

  /** Conjunctive (AND) search through the inverted index: filter the
    * postings to the query's analyzed terms (pushed to the scan),
    * count distinct terms per document, keep docs matching all terms.
    * One shuffle over the matching postings only — independent of
    * corpus text size. */
  def searchIndexAll(df: DataFrame, idCol: String, textCol: String,
      query: String): DataFrame = {
    val terms = analyzeQueryTerms(query).distinct
    require(terms.nonEmpty, "query analyzed to zero terms")
    // countDistinct dedups postings itself, so no separate .distinct()
    // aggregate: one logical agg over the term-filtered postings (the
    // term filter sits directly on the generate output, before any
    // exchange — only matching postings are ever shuffled). Par.ensure:
    // the regex analyzer is the CPU cost and must not run single-task
    // on single-split inputs (no-op at real scale).
    withSearchTokens(graft.util.Par.ensure(df), textCol)
      .select(col(idCol), explode(col("tokens")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("term")).as("__nt"))
      .filter(col("__nt") === terms.size)
      .select(col(idCol))
  }

  /** Register the 4 collections as temp views for spark.sql queries. */
  def registerTables(spark: SparkSession, outputDir: String): Unit = {
    Seq("publication", "publication_enriched", "concept", "bioentity", "taggedtext")
      .foreach { t =>
        val p = s"$outputDir/$t"
        if (new java.io.File(p).exists())
          spark.read.parquet(p).createOrReplaceTempView(t)
      }
  }
}
