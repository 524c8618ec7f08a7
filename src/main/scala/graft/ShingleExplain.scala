package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ShingleExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = util.Tables.documents(spark, "/root/testdata/sf0.1")
    val nonEmpty = docs.filter(col("text").isNotNull &&
      length(trim(col("text"))) > 0)
    val sh = datapipe.Contamination.shingles(col("text"), 3)
    println("===== variant 9 (size+explode no filter) =====")
    graft.util.Par.ensure(nonEmpty)
      .select(col("doc_id").as("id"), sh.as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n"),
        explode(col("sh")).as("s"))
      .explain(true)
    println("===== variant 4 (explode only) =====")
    graft.util.Par.ensure(nonEmpty)
      .select(col("doc_id").as("id"), explode(sh).as("s"))
      .explain(true)
    spark.stop()
  }
}
