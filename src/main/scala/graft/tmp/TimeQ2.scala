package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.DataPipeQueries
import graft.util.Tables

object TimeQ2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/documents.parquet").count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = DataPipeQueries.nearDupComponents(spark, d).count()
      println(f"q55 run$i: ${(System.nanoTime()-t0)/1e9}%.3f s ($n rows)")
    }
    // q6 variant A (current): collect_list + orderedPairs
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.queries.RelationalQueries.q6CoOccurrence(spark, d).count()
      println(f"q6cur run$i: ${(System.nanoTime()-t0)/1e9}%.3f s ($n rows)")
    }
    // q6 variant B: shuffle-hash self-join
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val l = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
      val a = l.toDF("ok", "p1").hint("shuffle_hash")
      val b = l.toDF("ok", "p2")
      val n = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(100).count()
      println(f"q6sj run$i: ${(System.nanoTime()-t0)/1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
