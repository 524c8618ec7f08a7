package graft

import org.apache.spark.sql.SparkSession

/** Stage-level profile of the MEDLINE pipeline (diagnostic main, not
  * part of the driver contract): source+parse / +dedup / +enrich. */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same corpus + vocab as Bench's medline_pipeline, so these stage
    // timings decompose that exact number
    val synthDir = Bench.medlineFixtureDir()
    val vocab = Bench.medlineVocab
    def time(tag: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"PROFILE $tag: ${best._1}%.2fs n=${best._2}")
    }
    time("source_only") {
      ops.MedlineSource.fragments(spark, s"$synthDir/*.xml.gz").count()
    }
    time("source+parse") {
      ops.MedlineParser.parse(spark,
        ops.MedlineSource.fragments(spark, s"$synthDir/*.xml.gz")).count()
    }
    time("source+parse+dedup") {
      ops.Dedup.latestNonDeleted(spark, ops.MedlineParser.parse(spark,
        ops.MedlineSource.fragments(spark, s"$synthDir/*.xml.gz"))).count()
    }
    time("full+enrich") {
      val latest = ops.Dedup.latestNonDeleted(spark, ops.MedlineParser.parse(spark,
        ops.MedlineSource.fragments(spark, s"$synthDir/*.xml.gz")))
      val e = ops.Enrich.enrich(spark, latest, vocab)
      e.write.mode("overwrite").format("noop").save()
      0L
    }
    spark.stop()
  }
}
