package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.Publication
import graft.ops.{Enrich, Splitters, VocabularySource}
import org.apache.spark.sql.functions._

class SearchFacadeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("english analyzer: lowercase, stopwords, plural stemming, possessives") {
    import spark.implicits._
    val df = Seq(
      ("1", "The Polo-like Kinases regulate the cell's cycles and diseases"),
    ).toDF("id", "text")
    val toks = SearchFacade.withSearchTokens(df, "text")
      .select(col("tokens")).as[Seq[String]].head()
    assert(toks.contains("kinase"), toks)  // plural stemmed
    assert(toks.contains("cycle"), toks)
    assert(toks.contains("disease"), toks) // ies -> y not applicable; diseases -> disease
    assert(toks.contains("cell"), toks)    // possessive stripped
    assert(!toks.contains("the"), toks)    // stopword
    assert(toks.contains("regulate"), toks)
  }

  test("match predicates") {
    import spark.implicits._
    val df = SearchFacade.withSearchTokens(Seq(
      ("1", "Asthma is a chronic airway disease"),
      ("2", "Parkinson disease affects motor neurons"),
      ("3", "Healthy subjects were enrolled"),
    ).toDF("id", "text"), "text")
    val all = df.filter(SearchFacade.matchAll(col("tokens"), "chronic asthma"))
      .select("id").as[String].collect().toSet
    assert(all == Set("1"))
    val any = df.filter(SearchFacade.matchAny(col("tokens"), "disease"))
      .select("id").as[String].collect().toSet
    assert(any == Set("1", "2"))
  }

  test("co-occurrence over concept relations") {
    import spark.implicits._
    val vocabs = VocabularySource.load(getClass.getResource("/vocab").getPath)
    val pubs = Seq(
      Publication(pub_id = "1", title = Some("NRG1 regulates schizophrenia risk."), filename = "f"),
      Publication(pub_id = "2", title = Some("NRG1 increases schizophrenia susceptibility."), filename = "f"),
      Publication(pub_id = "3", title = Some("FGF17 mutation causes autism behavior."), filename = "f"),
    )
    val enriched = Enrich.enrichedDF(spark, spark.createDataset(pubs), vocabs)
    val concepts = Splitters.concepts(enriched)
    val entities = Seq("ENSG00000157168", "http://www.ebi.ac.uk/efo/EFO_0000692")
    val co = SearchFacade.coOccurrence(concepts, entities)
    val rows = co.collect()
    // NRG1 ↔ schizophrenia co-occur in pubs 1 and 2
    val pair = rows.find(r => r.getAs[String]("a") == "ENSG00000157168" &&
      r.getAs[String]("b").contains("EFO_0000692"))
    assert(pair.isDefined, rows.toSeq)
    assert(pair.get.getAs[Long]("n_publications") == 2)
  }

  test("entity co-occurrence from bioentities") {
    import spark.implicits._
    val vocabs = VocabularySource.load(getClass.getResource("/vocab").getPath)
    val pubs = Seq(
      Publication(pub_id = "1", title = Some("NRG1 and schizophrenia in autism."), filename = "f"),
      Publication(pub_id = "2", title = Some("NRG1 linked to schizophrenia."), filename = "f"),
    )
    val enriched = Enrich.enrichedDF(spark, spark.createDataset(pubs), vocabs)
    val bio = Splitters.bioentities(enriched)
    val co = SearchFacade.entityCoOccurrence(bio).collect()
    assert(co.nonEmpty)
    val top = co.head
    assert(top.getAs[Long]("n_publications") == 2) // NRG1 x schizophrenia
  }

  test("phrase match requires consecutive analyzed terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "airway inflammation drives asthma"),
      (2L, "inflammation of the airway"), // reversed order
      (3L, "airway chronic inflammation") // gap
    ).toDF("id", "text")
    val t = SearchFacade.withSearchTokens(docs, "text")
    val hit = t.filter(SearchFacade.matchPhrase(col("tokens"), "airway inflammation"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L), hit)
    // single-term phrase degrades to contains
    val one = t.filter(SearchFacade.matchPhrase(col("tokens"), "asthma"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(one == Set(1L))
  }

  test("phrase match survives documents shorter than the phrase") {
    import spark.implicits._
    // regression: a doc with fewer analyzed tokens than the phrase used
    // to feed sequence(1, 0) = [1, 0] into slice() and crash the query
    val docs = Seq(
      (1L, "asthma"),                       // 1 token < 2-term phrase
      (2L, "the of and"),                   // analyzes to 0 tokens
      (3L, "airway inflammation persists")
    ).toDF("id", "text")
    val t = SearchFacade.withSearchTokens(docs, "text")
    val hit = t.filter(SearchFacade.matchPhrase(col("tokens"), "airway inflammation"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hit == Set(3L), hit)
  }

  test("tf-idf ranking: rarer terms dominate, term frequency breaks ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "asthma asthma asthma common common"),
      (2L, "asthma common common common"),
      (3L, "common common common common"),
      (4L, "unrelated words entirely")
    ).toDF("id", "text")
    // 'asthma' df=2, 'common' df=3: asthma idf higher; doc 1 has tf=3
    val ranked = SearchFacade.searchRanked(docs, "id", "text", "asthma common", k = 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(1L, 2L, 3L), ranked)
  }

  test("scala query analyzer mirrors the column analyzer") {
    import spark.implicits._
    val samples = Seq(
      "The cell's cycles; batches of Windows-based queries!",
      "kinases diseases bosses churches dishes boxes series bus hands",
      "a an the of", // all stopwords
      "x9 alpha-2 receptors 42",
    )
    val colToks = SearchFacade
      .withSearchTokens(samples.zipWithIndex.map(_.swap).toDF("id", "text"), "text")
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    val scalaToks = samples.map(SearchFacade.analyzeQueryTerms)
    assert(colToks == scalaToks, s"\ncol:   $colToks\nscala: $scalaToks")
  }

  test("inverted-index search equals scan-based matchAll") {
    import spark.implicits._
    val docs = Seq(
      (1L, "window functions batch the shuffle"),
      // analyzes to window/batche — same stems as the query's
      // windows/batches (minimal_english does NOT unify batch/batches;
      // that is faithful ES behavior)
      (2L, "windows and batches everywhere"),
      (3L, "windows only"),
      (4L, "batches only"),
      (5L, "nothing relevant"),
    ).toDF("doc_id", "text")
    val viaIndex = SearchFacade.searchIndexAll(docs, "doc_id", "text", "windows batches")
      .collect().map(_.getLong(0)).toSet
    val terms = SearchFacade.analyzeQueryTerms("windows batches")
    assert(terms == Seq("window", "batche"), terms)
    val viaScan = SearchFacade.withSearchTokens(docs, "text")
      .filter(SearchFacade.matchAll(col("tokens"), terms.mkString(" ")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == Set(2L))
    assert(viaIndex == viaScan)
  }

  test("bm25: saturation and length normalization differ from tf-idf") {
    import spark.implicits._
    val docs = Seq(
      // same tf for 'asthma' (1), shorter doc -> higher bm25 rank
      (1L, "asthma treatment"),
      (2L, "asthma treatment respiratory clinical longitudinal cohort evaluation"),
      // tf saturation: 10x tf must not give 10x weight over doc 1
      (3L, "asthma asthma asthma asthma asthma asthma asthma asthma asthma asthma"),
      (4L, "unrelated entirely"),
    ).toDF("id", "text")
    val ranked = SearchFacade.searchBm25(docs, "id", "text", "asthma", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq // (rank, id)
    // all three asthma docs match, ranks 1..3; doc 4 absent
    assert(ranked.map(_._2).toSet == Set(1L, 2L, 3L), ranked)
    val rankOf = ranked.map { case (r, id) => id -> r }.toMap
    // shorter doc beats longer doc at equal tf (length normalization)
    assert(rankOf(1L) < rankOf(2L), ranked)
    // repetition still wins over single mention, but is bounded:
    // doc 3 is also the SHORTEST doc with the highest tf -> rank 1
    assert(rankOf(3L) == 1L, ranked)
  }

  test("bm25 on an empty corpus returns an empty frame, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val out = SearchFacade.searchBm25(empty, "id", "text", "asthma")
    assert(out.columns.toSeq == Seq("rank", "id", "dl"))
    assert(out.count() == 0)
  }

  test("max filters limit enforced like ES max_adjacency_matrix_filters") {
    import spark.implicits._
    val concepts = Seq.empty[(String, String)].toDF("pub_id", "x")
    intercept[IllegalArgumentException] {
      SearchFacade.coOccurrence(
        concepts, (1 to 501).map(_.toString), maxFilters = 500)
    }
  }
}
