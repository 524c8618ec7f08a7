package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-2 fan-out of the enriched publication into the 4 collections
  * (SURVEY §2.11; reference main.py:590-716, 796-812): concepts,
  * bioentities, tagged text, small publication.
  *
  * The reference re-reads the enriched JSON from files and runs 4
  * independent branches; in Spark the enriched DataFrame is persisted
  * once and fanned out from cache — same semantics, one enrichment pass
  * (SURVEY §3.1). Every splitter below is pure Catalyst (explode /
  * struct surgery / dropFields) — no UDFs, fully codegen'd, no shuffle.
  */
object Splitters {

  /** Concepts collection (reference ExtractConcepts, main.py:590-645):
    * one row per concept, with CONCEPT pseudo-tags for subject/object
    * and the relations.directed/undirected cross-product strings
    * precomputed for the LINK co-occurrence query (SURVEY §2.3 J4).
    */
  def concepts(enriched: DataFrame): DataFrame = {
    val c = enriched.select(
      col("pub_id"),
      col("pub_date").as("date"),
      col("text_mined_entities.nlp.abbreviations").as("abbreviations"),
      explode(col("text_mined_entities.nlp.concepts")).as("concept"))

    // CONCEPT pseudo-tag arrays (category/label/match/reference from the
    // subject/object text; reference main.py:598-623)
    def pseudoTag(textCol: org.apache.spark.sql.Column, rangeCol: org.apache.spark.sql.Column) =
      array(struct(
        lit("CONCEPT").as("category"),
        rangeCol.getField("end").as("end"),
        textCol.as("label"),
        textCol.as("match"),
        textCol.as("original_value"),
        regexp_replace(textCol, " ", "_").as("reference"),
        lit("").as("reference_db"),
        lit(null).cast("int").as("sentence"),
        rangeCol.getField("start").as("start")))

    val withPseudo = c
      .withColumn("subject_concept_tags",
        pseudoTag(col("concept.subject"), col("concept.subject_range")))
      .withColumn("object_concept_tags",
        pseudoTag(col("concept.object"), col("concept.object_range")))

    // subject/object reference lists = existing tag references + CONCEPT ref
    val subjRefs = flatten(array(
      transform(flatten(map_values(col("concept.subject_tags"))), t => t.getField("reference")),
      array(regexp_replace(col("concept.subject"), " ", "_"))))
    val objRefs = flatten(array(
      transform(flatten(map_values(col("concept.object_tags"))), t => t.getField("reference")),
      array(regexp_replace(col("concept.object"), " ", "_"))))

    // relations: directed = s|o; undirected = s|o and o|s (main.py:624-633)
    val directed = flatten(transform(subjRefs, s =>
      transform(objRefs, o => concat_ws("|", s, o))))
    val undirected = flatten(transform(subjRefs, s =>
      flatten(transform(objRefs, o =>
        array(concat_ws("|", s, o), concat_ws("|", o, s))))))

    withPseudo
      .withColumn("relations", struct(
        directed.as("directed"), undirected.as("undirected")))
      .select(col("pub_id"), col("date"), col("abbreviations"),
        col("concept"), col("subject_concept_tags"),
        col("object_concept_tags"), col("relations"))
  }

  /** Bioentities collection (reference ExtractBioentities,
    * main.py:648-661): pub_id + tagged entities array. */
  def bioentities(enriched: DataFrame): DataFrame =
    enriched
      .filter(size(col("text_mined_entities.nlp.tagged_entities")) >= 0)
      .select(col("pub_id"),
        col("text_mined_entities.nlp.tagged_entities").as("entities"))

  /** Tagged-text collection (reference ExtractTaggedText,
    * main.py:664-688): first '. '-partition of the markup is the title. */
  def taggedText(enriched: DataFrame): DataFrame = {
    val tt = col("text_mined_entities.nlp.tagged_text")
    enriched.select(
      col("pub_id"),
      // partition('. '): text before the first '. ' / text after.
      // No separator → Python partition returns (full, '', ''), i.e.
      // title = full text, abstract = '' (reference main.py:672-675)
      when(instr(tt, ". ") > 0, substring_index(tt, ". ", 1)).otherwise(tt).as("title"),
      when(instr(tt, ". ") > 0,
        expr("substring(text_mined_entities.nlp.tagged_text, instr(text_mined_entities.nlp.tagged_text, '. ') + 2)"))
        .otherwise(lit("")).as("abstract"))
  }

  /** Small publication (reference CleanPublication, main.py:691-716):
    * drop the heavy nlp fields — pure Catalyst dropFields, no UDF. */
  def smallPublication(enriched: DataFrame): DataFrame =
    enriched.withColumn("text_mined_entities",
      col("text_mined_entities").withField("nlp",
        col("text_mined_entities.nlp")
          .dropFields("tagged_text", "tagged_entities", "concepts", "embedding_text")))
}
