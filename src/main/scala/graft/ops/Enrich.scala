package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Publication
import graft.nlp.DocumentAnalysis
import graft.nlp.DocumentAnalysis.TextMinedEntities
import graft.text.{BioentityTagger, Vocabulary, VocabEntry}

/** The NLP enrichment operator (SURVEY §2.8/§2.11; reference
  * NLPAnalysis DoFn, main.py:473-559).
  *
  * Spark idiom for Beam's `start_bundle` model init (main.py:486-523):
  * build the Aho-Corasick tagger ONCE on the driver from local vocab
  * JSONs, `broadcast` it, and run the per-document analysis inside
  * `mapPartitions` — the broadcast is deserialized once per executor,
  * never per row (an improvement over the reference, which re-downloads
  * vocabularies over HTTP on every worker, BioentityTagger.py:39-54).
  *
  * Scale: enrichment is a pure per-row map — no shuffle; it pipelines
  * directly after the dedup exchange. CPU-bound: throughput scales
  * linearly with cores.
  */
object Enrich {

  final case class Enriched(pub: Publication, text_mined_entities: TextMinedEntities)

  def enrich(
      spark: SparkSession,
      pubs: Dataset[Publication],
      vocabularies: Seq[Vocabulary]): Dataset[Enriched] = {
    import spark.implicits._
    val tagger = BioentityTagger.build(vocabularies)
    val bc = spark.sparkContext.broadcast(tagger)
    pubs.mapPartitions { it =>
      val t = Some(bc.value)
      it.map { p => Enriched(p, DocumentAnalysis.analyze(p.textToAnalyze, t)) }
    }
  }

  /** Flattened DataFrame with the reference's enriched-JSON layout:
    * publication fields + text_mined_entities column
    * (reference main.py:556-559: pub['text_mined_entities'] = {...}). */
  def enrichedDF(spark: SparkSession, pubs: Dataset[Publication],
      vocabularies: Seq[Vocabulary]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val abbrevFix = (path: String) => org.apache.spark.sql.functions.expr(
      s"transform($path, a -> named_struct('short', a.shortForm, 'long', a.longForm))")
    enrich(spark, pubs, vocabularies)
      .toDF()
      .select(col("pub.*"), col("text_mined_entities"))
      .withColumnRenamed("abstractText", "abstract")
      // restore the reference JSON field names (short/long are Java
      // keywords, so the case class uses shortForm/longForm)
      .withColumn("text_mined_entities", col("text_mined_entities")
        .withField("nlp.abbreviations", abbrevFix("text_mined_entities.nlp.abbreviations"))
        .withField("noun_phrases.abbreviations", abbrevFix("text_mined_entities.noun_phrases.abbreviations")))
  }
}

/** Local vocabulary dictionary source (SURVEY §2.1 S7; reference
  * BioentityTagger.py:39-59 + modules/vocabulary.py): a directory of
  * `CATEGORY-REFERENCEDB.json` files, each
  * `{surface: {ids: [...], pref_name}}`. Loaded driver-side (they are
  * small reference data), then broadcast inside the tagger.
  */
object VocabularySource {
  import com.fasterxml.jackson.databind.ObjectMapper

  def load(dir: String): Seq[Vocabulary] = {
    val files = new java.io.File(dir).listFiles()
    require(files != null, s"vocabulary dir not found: $dir")
    val mapper = new ObjectMapper()
    files.filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq.map { f =>
      // filename encodes CATEGORY-REFERENCEDB (BioentityTagger.py:55)
      val parts = f.getName.stripSuffix(".json").split("_")(0).split("-", 2)
      require(parts.length == 2,
        s"vocabulary file '${f.getName}' does not follow the CATEGORY-REFERENCEDB naming convention")
      val Array(category, refDb) = parts
      val root = mapper.readTree(f)
      val entries = scala.collection.mutable.Map.empty[String, VocabEntry]
      val it = root.fields()
      while (it.hasNext) {
        val e = it.next()
        val ids = {
          val n = e.getValue.get("ids")
          if (n == null) Seq.empty[String]
          else (0 until n.size()).map(i => n.get(i).asText())
        }
        val pref = Option(e.getValue.get("pref_name")).map(_.asText()).getOrElse("")
        entries(e.getKey) = VocabEntry(ids, pref)
      }
      Vocabulary(category, refDb, entries.toMap)
    }
  }
}
