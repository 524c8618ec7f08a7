package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.Publication
import graft.nlp.DocumentAnalysis
import org.apache.spark.sql.functions._

/** Enrichment operator + stage-2 splitters over the chromosome8p golden
  * text (reference tests/text_nlp.py:11-30, 451-498) and the vocab
  * fixtures. */
class EnrichSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val vocabDir = getClass.getResource("/vocab").getPath
  lazy val vocabs = VocabularySource.load(vocabDir)

  val chromosome8p = "Chromosome 8p as a potential hub for developmental neuropsychiatric " +
    "disorders: implications for schizophrenia, autism and cancer. Defects in genetic and " +
    "developmental processes are thought to contribute susceptibility to autism and " +
    "schizophrenia. Molecular genetics and developmental studies have identified 21 genes " +
    "in this region (ADRA1A, ARHGEF10, CHRNA2, PPP3CC, SFRP1 and VMAT1/SLC18A1) that are " +
    "most likely to contribute to neuropsychiatric disorders (schizophrenia, autism, " +
    "bipolar disorder and depression), neurodegenerative disorders and cancer. " +
    "Molecular genetics studies of these 8p genes may inform neuropsychiatric disease."

  test("vocabulary source parses category/refdb and entries") {
    assert(vocabs.map(_.category).toSet == Set("GENE", "DISEASE"))
    val gene = vocabs.find(_.category == "GENE").get
    assert(gene.referenceDb == "OPENTARGETS")
    assert(gene.entries("ADRA1A").ids == Seq("ENSG00000120907"))
    assert(gene.entries("ADRA1A").prefName == "ADRA1D")
  }

  test("document analysis produces the full text_mined_entities struct") {
    val tagger = graft.text.BioentityTagger.build(vocabs)
    val tme = DocumentAnalysis.analyze(chromosome8p, Some(tagger))
    val nlp = tme.nlp
    // tags: genes + diseases found
    val cats = nlp.tagged_entities.map(_.category).toSet
    assert(cats.contains("GENE"), cats)
    assert(cats.contains("DISEASE"), cats)
    // TARGET&DISEASE synthetic tag on sentences with both
    assert(cats.contains("TARGET&DISEASE"), cats)
    // tag/range consistency (text_nlp.py:451-464): match == text[start:end)
    val lowered = graft.text.TextNormalizer.normalize(chromosome8p).toLowerCase
    nlp.tagged_entities.filter(_.category != "TARGET&DISEASE").foreach { t =>
      assert(lowered.substring(t.start, t.end) == t.`match`,
        s"${t.`match`} vs ${lowered.substring(t.start, t.end)}")
    }
    // noun phrases include the molecular genetics chunk
    assert(nlp.chunks.exists(_.toLowerCase.contains("molecular genetics")), nlp.chunks)
    // embedding text invariants (text_nlp.py:485-498)
    assert(!nlp.embedding_text.plain.contains(","))
    assert(nlp.embedding_text.plain.contains("molecular_genetics"))
    assert(nlp.embedding_text.pos_tag.contains("molecular_genetics|NOUN"))
    assert(nlp.embedding_text.ent_tag.contains("ensg00000120907|GENE|ADRA1D"),
      nlp.embedding_text.ent_tag)
    // tagged text is balanced markup
    assert(nlp.tagged_text.startsWith("""<div  class="entities">"""))
    // top chunks fewer than chunks
    assert(nlp.top_chunks.length < math.max(nlp.chunks.length, 1))
  }

  test("common-word gene filter: lowercase 'age' does not tag as GENE") {
    val tagger = graft.text.BioentityTagger.build(vocabs)
    val tme = DocumentAnalysis.analyze(
      "The age of the patients was recorded at enrollment.", Some(tagger))
    assert(!tme.nlp.tagged_entities.exists(t => t.category == "GENE" && t.`match` == "age"))
    // but the true-cased label matches: AGE as written
    val tme2 = DocumentAnalysis.analyze(
      "Expression of AGE was elevated in patients.", Some(tagger))
    assert(tme2.nlp.tagged_entities.exists(t => t.category == "GENE" && t.`match` == "age"))
  }

  test("enrich operator over parsed medline fixtures + splitters") {
    import spark.implicits._
    val fixtureDir = "/root/reference/tests/resources/test-medlinexml"
    val pubs = MedlineParser.parse(spark,
      MedlineSource.fragments(spark, s"$fixtureDir/test_baseline.xml.gz"))
    val enriched = Enrich.enrichedDF(spark, pubs, vocabs).persist()
    assert(enriched.count() == 4)
    assert(enriched.columns.contains("abstract"))
    assert(enriched.columns.contains("text_mined_entities"))

    val small = Splitters.smallPublication(enriched)
    val nlpFields = small.schema("text_mined_entities").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("nlp").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(!nlpFields.contains("tagged_text"))
    assert(!nlpFields.contains("tagged_entities"))
    assert(!nlpFields.contains("concepts"))
    assert(!nlpFields.contains("embedding_text"))
    assert(nlpFields.contains("chunks"))

    val bio = Splitters.bioentities(enriched)
    assert(bio.columns.toSet == Set("pub_id", "entities"))
    assert(bio.count() == 4)

    val tt = Splitters.taggedText(enriched)
    assert(tt.columns.toSet == Set("pub_id", "title", "abstract"))

    val con = Splitters.concepts(enriched)
    assert(con.columns.contains("relations"))
    // every concept row has directed relations incl. the CONCEPT self-refs
    if (con.count() > 0) {
      val r = con.select(size(col("relations.directed")).as("n")).agg(min(col("n"))).head().getInt(0)
      assert(r >= 1)
    }
    enriched.unpersist()
  }

  test("taggedText partition fallback: no '. ' separator -> title=text, abstract=''") {
    import spark.implicits._
    // title-only pub: tagged_text has no ". " (period abuts markup)
    val pub = Publication(pub_id = "7", title = Some("Asthma"), filename = "f")
    val enriched = Enrich.enrichedDF(spark, spark.createDataset(Seq(pub)), vocabs)
    val row = Splitters.taggedText(enriched).head()
    assert(row.getAs[String]("title").nonEmpty) // full text goes to title
    assert(row.getAs[String]("abstract") == "")
  }

  test("concept relations cross-product with entity tags") {
    import spark.implicits._
    val tagger = graft.text.BioentityTagger.build(vocabs)
    val pub = Publication(pub_id = "42",
      title = Some("NRG1 regulates schizophrenia risk."),
      abstractText = Some("Variants of NRG1 increase schizophrenia susceptibility."),
      filename = "f1")
    val ds = spark.createDataset(Seq(pub))
    val enriched = Enrich.enrichedDF(spark, ds, vocabs)
    val con = Splitters.concepts(enriched)
    import spark.implicits._
    val dir = con.select(explode(col("relations.directed")).as("r"))
      .as[String].collect()
    assert(dir.nonEmpty)
    assert(dir.forall(_.contains("|")), dir.toSeq)
    // NRG1|schizophrenia pair should appear via the entity tags
    assert(dir.exists(r => r.toLowerCase.contains("ensg") || r.contains("_")), dir.toSeq)
  }
}
