package graft

import org.apache.spark.sql.SparkSession

/** Solo-query profiling main (diagnostic, NOT part of the driver
  * contract): runs each named query `reps` times in the exact Bench
  * session shape (master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, AQE on) and prints every run's wall
  * seconds — the tool behind the round-18 scaling investigation.
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.QProfile q149_random_walks [more...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_QPROFILE_REPS (default 3).
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QPROFILE_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up codegen + file listing (same as Bench)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count())
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"QPROFILE $n: NOT FOUND")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(n)
          val c0 = Bench.miniSpin()
          val ts = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val c1 = Bench.miniSpin()
          println(f"QPROFILE $n cpus=$cpus: min=${ts.min}%.2fs runs=" +
            ts.map(t => f"$t%.2f").mkString(",") +
            f" calib=$c0%.2f/$c1%.2f")
      }
    }
    spark.stop()
  }
}
