package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of q124 (curation_funnel2) — diagnostic main.
  * Times each funnel stage in isolation (inputs pre-materialized) so
  * the 14.5 s bench cost is attributable. */
object Funnel2Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = util.Tables.documents(spark, sfDir)
    docs.count()

    def time(tag: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"PROFILE $tag: ${best._1}%.2fs n=${best._2}")
    }

    import datapipe._
    // replicate messyPiiDocs (private in DataPipeQueries)
    val m = col("doc_id") % 5
    val messy = docs.select(col("doc_id"),
      concat(coalesce(col("text"), lit("")),
        when(m === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com now")))
        .when(m === 1, concat(lit(" from 10.0."),
          (col("doc_id") % 250).cast("string"), lit(".7 port")))
        .when(m === 2, concat(lit(" call +1415555"),
          (col("doc_id") % 10).cast("string"), lit(" today")))
        .when(m === 3, lit(" ssn 123-45-6789 leaked"))
        .otherwise(lit(""))).as("text"))

    time("stage1 pii redact + source join + cp") {
      Pii.redact(messy)
        .select(col("doc_id"), col("clean_text").as("text"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .localCheckpoint(true).count()
    }
    val clean = Pii.redact(messy)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .localCheckpoint(true)
    time("stage2 repetitionCharMetrics") {
      QualityScore.repetitionCharMetrics(clean)
        .filter(col("keep_rep") === 1).count()
    }
    time("stage3 charEntropy") {
      QualityScore.charEntropy(clean).count()
    }
    time("stage4 canonicalDedup") {
      DedupOps.canonicalDedup(clean).count()
    }
    time("stage5 importanceWeights (dsir)") {
      Importance.importanceWeights(clean,
        clean.filter(col("source") === "web"), buckets = 64).count()
    }
    time("q124 full") {
      queries.DataPipeQueries.curationFunnel2(spark, sfDir).count()
    }
    spark.stop()
  }
}
