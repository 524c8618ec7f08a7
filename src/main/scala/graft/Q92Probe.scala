package graft

import org.apache.spark.sql.SparkSession

/** Solo timing probe for individual SparkEntry queries (diagnostic):
  * runMain graft.Q92Probe [sfDir] q92_image_neardup ... — bench-identical
  * methodology (count, min of 2, warm session). */
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"SOLO $n: $t%.3f s")
      }
    }
    spark.stop()
  }
}
