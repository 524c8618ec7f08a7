package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CLI mirroring the reference pipeline entry (reference main.py:729-816):
  *
  * {{{
  * runMain graft.ops.PipelineMain
  *   --input-baseline <glob> [--input-updates <glob>]
  *   --output <dir> [--vocab <dir>] [--format json|parquet]
  *   | --input-enriched <path> --output <dir>
  * }}}
  *
  * Passing --vocab enables the NLP enrichment + 4-collection fan-out;
  * without it only the deduplicated publication table is written.
  * All flags take a value (flag pairing is positional).
  *
  * Graph: read XML(.gz) → parse fragments → union baseline+updates →
  * latest-per-PMID dedup + tombstones → write `publication` parquet
  * (and, with --vocab, the NLP-enriched 4-collection fan-out).
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val inputEnriched = opts.get("input-enriched")
    val baseline = opts.getOrElse("input-baseline",
      if (inputEnriched.isEmpty) sys.error("--input-baseline or --input-enriched required") else "")
    val updates = opts.get("input-updates")
    val output = opts.getOrElse("output", sys.error("--output required"))
    // "json" writes gzipped line-JSON like the reference's WriteToText
    // sinks (main.py:786-787); default parquet (the query-side format)
    val format = opts.getOrElse("format", "parquet")
    def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
      if (format == "json")
        df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
      else df.write.mode(SaveMode.Overwrite).parquet(path)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-medline-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // split-only graph shape (reference --input_enriched mode,
    // main.py:789-812): re-read previously enriched output and fan out
    inputEnriched.foreach { enrichedPath =>
      val enriched =
        (if (format == "json") spark.read.json(enrichedPath)
         else spark.read.parquet(enrichedPath))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      write(Splitters.concepts(enriched), s"$output/concept")
      write(Splitters.bioentities(enriched), s"$output/bioentity")
      write(Splitters.taggedText(enriched), s"$output/taggedtext")
      write(Splitters.smallPublication(enriched), s"$output/publication")
      println(s"""{"mode": "split-only", "publications": ${enriched.count()}, "output": "$output"}""")
      enriched.unpersist()
      spark.stop()
      return
    }

    val baseDs = MedlineParser.parse(spark, MedlineSource.fragments(spark, baseline))
    val allDs = updates match {
      case Some(u) =>
        baseDs.unionByName(MedlineParser.parse(spark, MedlineSource.fragments(spark, u)))
      case None => baseDs
    }
    val latest = Dedup.latestNonDeleted(spark, allDs)

    opts.get("vocab") match {
      case Some(vocabDir) =>
        // full graph: enrich once, persist, fan out the 4 collections
        // from cache (the reference re-reads files 4×; SURVEY §3.1)
        val vocabs = VocabularySource.load(vocabDir)
        val enriched = Enrich.enrichedDF(spark, latest, vocabs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        write(enriched, s"$output/publication_enriched")
        write(Splitters.concepts(enriched), s"$output/concept")
        write(Splitters.bioentities(enriched), s"$output/bioentity")
        write(Splitters.taggedText(enriched), s"$output/taggedtext")
        write(Splitters.smallPublication(enriched), s"$output/publication")
        def readBack(p: String) =
          if (format == "json") spark.read.json(p) else spark.read.parquet(p)
        val n = readBack(s"$output/publication").count()
        val nc = readBack(s"$output/concept").count()
        println(s"""{"publications": $n, "concepts": $nc, "output": "$output"}""")
        enriched.unpersist()
      case None =>
        write(latest.withColumnRenamed("abstractText", "abstract"), s"$output/publication")
        def readBack(p: String) =
          if (format == "json") spark.read.json(p) else spark.read.parquet(p)
        val n = readBack(s"$output/publication").count()
        println(s"""{"publications": $n, "output": "$output/publication"}""")
    }
    spark.stop()
  }
}
