package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the exact-similarity-join family (q157/q158/
  * q162) — diagnostic main, not part of the driver contract. Decomposes
  * [[datapipe.DedupOps.ppjoinExact]] / `ppjoinIncremental` the way
  * [[DataPipeProfile]] decomposes q13, so the 100 TB plan's cost is
  * attributable to a stage (shingle postings, df pass, prefix window,
  * candidate join, exact verify) instead of "the query". */
object PpjoinProfile {
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
    docs.count() // warm file listing

    def time(tag: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"PROFILE $tag: ${best._1}%.2fs n=${best._2}")
    }

    import datapipe.DedupOps
    import org.apache.spark.sql.expressions.Window

    // stage 1: shingle postings (explode) alone
    time("st postings build") {
      DedupOps.shingledPostings(docs, "doc_id", "text", 3).count()
    }
    // stage 2: postings + document-frequency pass
    time("st + dfreq") {
      val st = DedupOps.shingledPostings(docs, "doc_id", "text", 3).persist()
      st.count()
      val n = st.groupBy(col("s")).agg(count(lit(1)).as("df")).count()
      st.unpersist(); n
    }
    // stage 3: + prefix postings (join + per-doc window)
    time("st + dfreq + prefix") {
      val st = DedupOps.shingledPostings(docs, "doc_id", "text", 3).persist()
      st.count()
      val dfreq = st.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val n = DedupOps.prefixPostings(st, dfreq, 1L, 2L).count()
      st.unpersist(); n
    }
    // stage 4: + candidate self-join + distinct
    time("st..candidates") {
      val st = DedupOps.shingledPostings(docs, "doc_id", "text", 3).persist()
      st.count()
      val dfreq = st.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val pos = DedupOps.prefixPostings(st, dfreq, 1L, 2L)
      val a = pos.select(col("s"), col("id").as("id_a"), col("n").as("na"))
      val b = pos.select(col("s"), col("id").as("id_b"), col("n").as("nb"))
      val n = a.join(b, Seq("s"))
        .filter(col("id_a") < col("id_b") &&
          lit(2L) * least(col("na"), col("nb")) >=
            lit(1L) * greatest(col("na"), col("nb")))
        .select(col("id_a"), col("id_b"))
        .distinct().count()
      st.unpersist(); n
    }
    // full q157
    time("ppjoinExact full") {
      DedupOps.ppjoinExact(docs).count()
    }
    // full q162
    time("ppjoinIncremental full") {
      DedupOps.ppjoinIncremental(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0)).count()
    }
    spark.stop()
  }
}
