package graft.util

import org.apache.spark.sql.SparkSession

/** Local iteration helper: time individual SparkEntry queries by name
  * against a testdata dir (`TIMEQ_DIR`, default sf0.1) in one warm
  * session. Not part of the driver contract — Bench.scala is the
  * artifact of record; this exists for plan/perf iteration on single
  * queries without paying a full bench sweep. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("TIMEQ_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).collect().length
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
