package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profile of the shingle-postings build (the dominant stage of
  * the q157/q158/q162 exact-join family per [[PpjoinProfile]]) —
  * isolates scan, repartition, expression evaluation count, and the
  * SQL-expression vs native-call implementations. Diagnostic main. */
object ShingleProfile {
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

    val nonEmpty = docs.filter(col("text").isNotNull &&
      length(trim(col("text"))) > 0)
    val sh = datapipe.Contamination.shingles(col("text"), 3)

    time("0 scan only") { docs.count() }
    time("1 repartition only") {
      graft.util.Par.ensure(nonEmpty).count()
    }
    time("2 shingles eval once (sum sizes), no repart") {
      nonEmpty.select(size(sh).as("z")).agg(sum(col("z"))).count()
    }
    time("3 shingles eval once (sum sizes), repart") {
      graft.util.Par.ensure(nonEmpty)
        .select(size(sh).as("z")).agg(sum(col("z"))).count()
    }
    time("4 shingles + explode (single select)") {
      graft.util.Par.ensure(nonEmpty)
        .select(col("doc_id").as("id"), explode(sh).as("s")).count()
    }
    time("5 shingledPostings as-is (filter+size+explode)") {
      datapipe.DedupOps.shingledPostings(docs, "doc_id", "text", 3).count()
    }
    // UDF alternative: one Scala call per row producing the string
    // shingle array (same semantics as the SQL expression)
    val shingleUdf = udf((t: String) =>
      datapipe.Hashing.shingleStrings(if (t == null) "" else t, 3))
    time("6 scala shingleStrings udf + explode") {
      graft.util.Par.ensure(nonEmpty)
        .select(col("doc_id").as("id"), explode(shingleUdf(col("text"))).as("s"))
        .count()
    }
    time("7 hash shingle set (fnv longs) udf + explode") {
      val hudf = udf((t: String) =>
        datapipe.Hashing.shingleSet(if (t == null) "" else t, 3))
      graft.util.Par.ensure(nonEmpty)
        .select(col("doc_id").as("id"), explode(hudf(col("text"))).as("s"))
        .count()
    }
    // single-Project struct-array form: (n, s) packed per element so
    // one Generate produces both columns — no cross-operator re-eval
    time("8 struct-array explode (single generate)") {
      graft.util.Par.ensure(nonEmpty)
        .select(col("doc_id").as("id"),
          explode(transform(sh, x =>
            struct(size(sh).as("n"), x.as("s")))).as("e"))
        .select(col("id"), col("e.n").cast("long").as("n"), col("e.s").as("s"))
        .count()
    }
    // as-is shape minus the redundant size>0 filter (explode drops
    // empty arrays anyway)
    time("9 size+explode, no filter") {
      graft.util.Par.ensure(nonEmpty)
        .select(col("doc_id").as("id"), sh.as("sh"))
        .select(col("id"), size(col("sh")).cast("long").as("n"),
          explode(col("sh")).as("s"))
        .count()
    }
    println("---- plan of as-is shingledPostings ----")
    datapipe.DedupOps.shingledPostings(docs, "doc_id", "text", 3)
      .explain("formatted")
    spark.stop()
  }
}
