package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the contamination family (q73/q98/q99) —
  * diagnostic main. */
object ContamProfile {
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
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val evalD = docs.filter(col("doc_id") % 97 === 0)
    val sh = Contamination.shingles(col("text"), 3)

    time("eval shingles distinct") {
      evalD.filter(length(trim(col("text"))) > 0)
        .select(explode(sh).as("__sh")).distinct().count()
    }
    time("train postings explode") {
      train.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(sh).as("__sh")).count()
    }
    time("q73 contaminated full") {
      Contamination.contaminated(train, evalD, "doc_id", "text", 3).count()
    }
    time("q99 bloom-pruned full") {
      Contamination.contaminatedBloomPruned(train, evalD, "doc_id", "text", 3).count()
    }
    println("---- plan of contaminated ----")
    Contamination.contaminated(train, evalD, "doc_id", "text", 3)
      .explain("formatted")
    spark.stop()
  }
}
