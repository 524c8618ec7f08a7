package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale rehearsal (sf1-equivalent): amplifies the sf0.1 documents
  * and embeddings tables 10× with structure-preserving perturbations,
  * then times the headline dedup / ANN / search / contamination /
  * mixture queries and the MEDLINE pipeline at that scale. The point is
  * memory-shape validation — every operator must hold its bounded
  * per-task state when the corpus grows 10× — not oracle correctness
  * (the driver's gate runs at sf0.01).
  *
  * Amplification preserves the interesting structure:
  *  - documents: copy k rewrites every token t → t_k, so a planted
  *    near-dup pair stays an equally-similar pair inside its copy while
  *    copies of the same doc share ZERO shingles (no artificial
  *    cross-copy near-dup explosion that mass row duplication would
  *    cause);
  *  - embeddings: copy k adds deterministic per-component noise (cosine
  *    neighborhoods inside a copy survive; copies don't collapse onto
  *    each other).
  *
  * Usage: runMain graft.ScaleRehearsal [factor] (default 10).
  * Prints one JSON line of wall-times; see COVERAGE.md "10× scale
  * rehearsal" for recorded results + analysis.
  */
object ScaleRehearsal {

  def amplify(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val out = new java.io.File(outDir)
    if (new java.io.File(s"$outDir/_DONE_$factor").exists()) return
    out.mkdirs()
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = docs.count()
    (0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * nDocs)).as("doc_id"),
        // token t -> t_k: same-copy similarity preserved, cross-copy zero
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1_$k")).as("text"),
        col("lang"), col("source"))
    }.reduce(_.unionByName(_))
      // n_chars from the REWRITTEN text (a select-level length() would
      // still see the input column)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nEmb = emb.count()
    (0 until factor).map { k =>
      emb.select(
        (col("vec_id") + lit(k.toLong * nEmb)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + ((i + lit(k * 31)) % 7).cast("float") * lit(0.01f) - lit(0.03f))
          .as("embedding"))
    }.reduce(_.unionByName(_))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    new java.io.File(s"$outDir/_DONE_$factor").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = s"/tmp/graft_scale_${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    amplify(spark, srcDir, dir, factor)

    val headline = Seq(
      "q12_dedup_exact", "q13_dedup_minhash", "q14_dedup_simhash",
      "q15_knn_cosine", "q16_knn_ivf", "q20_cosine_neardup",
      "q55_neardup_components", "q61_inverted_search", "q62_bm25_search",
      "q64_sequence_packing", "q65_mixture_schedule", "q73_contamination",
      "q75_incremental_dedup", "q76_repetition", "q77_split_manifest",
      "q78_weighted_sample", "q79_topk_per_group", "q80_tfidf_keywords",
      "q81_heavy_hitters", "q82_dup_spans", "q83_token_budget",
      "q84_source_overlap", "q86_curated_mix", "q87_stratified_weighted",
      "q88_split_leakage", "q89_span_removal", "q90_bpe_encode",
      "q92_image_neardup", "q93_video_meta", "q94_bpe_budget",
      "q95_kmeans", "q96_semantic_dedup", "q97_ngram_novelty",
      "q98_decontaminate", "q99_contamination_bloom", "q100_rank_normalize",
      "q101_leakfree_split", "q102_dataset_card", "q103_llm_funnel",
      "q104_bpe_merges", "q105_text_featurize", "q106_pca_moments",
      "q107_lm_score", "q108_doc_chunks", "q109_pca_projection",
      "q110_int8_quantize", "q111_bpe_chunks", "q112_gopher_rules",
      "q113_dedup_keepbest", "q114_tokenizer_fertility",
      "q115_cms_frequency", "q116_canonical_dedup", "q117_oov_score",
      "q118_mixture_apportion", "q119_repetition_chars",
      "q120_dsir_weights", "q121_char_entropy", "q122_epoch_shuffle",
      "q123_pii_redact", "q124_curation_funnel2", "q125_backoff_lm",
      "q126_sentence_dedup", "q127_zipf_card", "q128_epoch_plan",
      "q129_sentence_dedup_inc", "q130_span_corrupt", "q131_heaps_curve",
      "q132_unimax_allocate")
      .filter(n => args.lift(1).forall(f => f.r.findFirstIn(n).isDefined))
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      counts(name) = fn(spark, dir).count()
      times(name) = (System.nanoTime() - t0) / 1e9
    }

    // MEDLINE pipeline at 10x the bench corpus (32 files x 7000 vs 700)
    val medDir = s"/tmp/graft_scale_medline_${factor}x"
    if (!new java.io.File(s"$medDir/pubmed20n0000.xml.gz").exists())
      ops.MedlineGen.generate(medDir, nFiles = 32, perFile = 700 * factor)
    val t0 = System.nanoTime()
    val parsed = ops.MedlineParser.parse(spark,
      ops.MedlineSource.fragments(spark, s"$medDir/*.xml.gz"))
    val latest = ops.Dedup.latestNonDeleted(spark, parsed)
    graft.ops.Enrich.enrich(spark, latest, Bench.medlineVocab)
      .write.mode("overwrite").format("noop").save()
    times("medline_pipeline") = (System.nanoTime() - t0) / 1e9
    counts("medline_pipeline") = parsed.count()

    val qs = times.map { case (k, v) =>
      "\"" + k + "\":{\"sec\":" + f"$v%.2f" + ",\"rows\":" + counts(k) + "}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_rehearsal","factor":$factor,"queries":$qs}""")
    spark.stop()
  }
}
