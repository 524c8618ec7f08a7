package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datapipe._
import graft.text.StopWords
import graft.util.Tables

/** Training-data pipeline operators exposed on the driver's query
  * surface (builder brief: dedup family, similarity search, text
  * analysis), all over the synthetic documents/embeddings tables.
  */
object DataPipeQueries {

  def dedupExact(s: SparkSession, d: String): DataFrame =
    DedupOps.exactDedup(Tables.documents(s, d))

  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    DedupOps.minhashNearDupPairs(Tables.documents(s, d), minJaccard = 0.5)

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    DedupOps.simhashNearDupPairs(Tables.documents(s, d), maxHamming = 3)

  def knnCosine(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnBruteForce(emb, emb.filter(col("vec_id") < 5), k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  def knnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnIvf(emb, emb.filter(col("vec_id") < 5), k = 5, nCells = 8, nProbe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  def cosineNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // cells ∝ √N keeps per-cell pair counts ~constant as the corpus
    // grows (candidate pairs scale linearly, not quadratically)
    val nCells = math.max(8, math.sqrt(emb.count().toDouble).toInt)
    Similarity.cosineNearDupPairs(emb, threshold = 0.45, nCells = nCells)
  }

  def langId(s: SparkSession, d: String): DataFrame =
    LangId.predict(Tables.documents(s, d))

  def textQuality(s: SparkSession, d: String): DataFrame =
    QualityScore.metrics(Tables.documents(s, d))

  def fingerprints(s: SparkSession, d: String): DataFrame =
    DedupOps.fingerprints(Tables.documents(s, d)).orderBy(col("id"))

  /** Dictionary surfaces for the q26 contains-join (words known to
    * occur in the synthetic documents' vocabulary). */
  val dictSurfaces: Seq[String] =
    Seq("spark", "query", "window", "shuffle", "vector", "merge batch",
      "hash join", "columnar", "stream", "sort table")

  /** Substring-dictionary join planned through the custom
    * [[graft.plans.DictionaryJoinStrategy]] (broadcast Aho-Corasick
    * scan instead of BroadcastNestedLoop). Oracle-verified: DuckDB runs
    * the same join with its own contains(). */
  def dictionaryJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.experimental.extraStrategies =
      Seq(graft.plans.DictionaryJoinStrategy)
    val vocab = dictSurfaces.toDF("surface")
    Tables.documents(s, d)
      .join(vocab, expr("contains(text, surface)"))
      .select(col("doc_id"), col("surface"))
      .orderBy(col("doc_id"), col("surface"))
  }

  def dictionaryJoinOracle: String = {
    val values = dictSurfaces.map(w => s"('$w')").mkString(", ")
    s"""SELECT d.doc_id, v.surface
       |FROM documents d JOIN (VALUES $values) v(surface)
       |  ON contains(d.text, v.surface)
       |ORDER BY d.doc_id, v.surface""".stripMargin
  }

  /** DuckDB oracle for textQuality, generated so the stopword list is
    * identical to the Spark side (StopWords.glasgow). */
  def textQualityOracle: String = {
    val stopList = StopWords.glasgow.toSeq.sorted
      .map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")
    s"""SELECT doc_id,
       | CAST(length(text) AS BIGINT) AS n_chars_measured,
       | CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       | CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |     t -> list_contains($stopList, lower(t)))) AS BIGINT) AS n_stopwords,
       | CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
       | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
       | CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |     t -> length(t) > 15)) AS BIGINT) AS n_long_tokens
       |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin
  }
}
