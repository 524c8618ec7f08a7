package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Splittable-in-spirit MEDLINE XML fragment source (SURVEY §2.1 S1/S2;
  * reference main.py:107-232).
  *
  * Reads (optionally gzipped) MEDLINE XML files and yields
  * `(fragment, fileName)` where a fragment is one complete
  * `<MedlineCitation>…</MedlineCitation>` or
  * `<DeleteCitation>…</DeleteCitation>` element; prologue/epilogue lines
  * are skipped.
  *
  * Scale design: `.gz` is unsplittable in any engine (the reference
  * degrades to file-granularity too, main.py:165-171), so parallelism is
  * per-file — exactly how MEDLINE ships (1000+ baseline files). Spark's
  * FileScan may pack several small files into one partition; the scanner
  * tracks `input_file_name` transitions so fragments never leak across
  * files. For uncompressed XML, Spark splits files by range and a
  * fragment could straddle a split — for that case use
  * `spark.sql.files.maxPartitionBytes` large enough or store gz;
  * MEDLINE distributes gz only.
  */
object MedlineSource {

  /** Record-boundary line scanner (reference main.py:107-124): a record
    * starts at a line beginning with `<MedlineCitation ` or
    * `<DeleteCitation>` and ends at `</MedlineCitation>` /
    * `</DeleteCitation>`. Lines are stripped and joined with "".
    */
  private[ops] def assemble(lines: Iterator[(String, String)]): Iterator[(String, String)] =
    new Iterator[(String, String)] {
      private var nextFragment: (String, String) = _
      private val record = new StringBuilder
      private var inRecord = false
      private var currentFile = ""

      private def advance(): Unit = {
        nextFragment = null
        while (nextFragment == null && lines.hasNext) {
          val (rawLine, file) = lines.next()
          if (file != currentFile) { // file switch: drop incomplete record
            currentFile = file
            record.clear()
            inRecord = false
          }
          val line = rawLine.trim
          if (line.startsWith("<MedlineCitation ") || line.startsWith("<MedlineCitation>") ||
              line.startsWith("<DeleteCitation>")) inRecord = true
          if (inRecord) record.append(line)
          if (line.startsWith("</MedlineCitation>") || line.startsWith("</DeleteCitation>")) {
            val frag = record.toString.trim
            record.clear()
            inRecord = false
            if (frag.nonEmpty)
              nextFragment = (frag, file.split('/').last)
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextFragment != null
      override def next(): (String, String) = {
        val r = nextFragment
        advance()
        r
      }
    }

  /** Dataset of (xmlFragment, fileName) from a glob of MEDLINE XML(.gz)
    * paths. Gzip decoding is native to the text source. */
  def fragments(spark: SparkSession, paths: Seq[String]): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.text(paths: _*)
      .select(col("value"), input_file_name().as("file"))
      .as[(String, String)]
      .mapPartitions(assemble)
  }

  def fragments(spark: SparkSession, path: String): Dataset[(String, String)] =
    fragments(spark, Seq(path))

  /** Streaming variant: watch a directory for new MEDLINE files (the
    * updatefiles drop-feed as a continuous source; pairs with
    * [[graft.streaming.StreamingPipeline.latestVersionStream]]).
    * Each arriving file is one unsplittable unit, so fragment assembly
    * is per-file exactly as in batch. */
  def fragmentsStream(spark: SparkSession, dir: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", 16)
      .text(dir)
      .select(col("value"), input_file_name().as("file"))
      .as[(String, String)]
      .mapPartitions(assemble)
  }
}
