package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for plans/r17: the ROUND-16 (pre-optimization)
  * internal stage plans of ppjoinExact, reconstructed verbatim from
  * the old body (git history) because the query-level explain is
  * checkpoint-hidden. Diagnostic main. */
object PpjoinPlanDumpOld {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = util.Tables.documents(spark, "/root/testdata/sf0.1")
    val (num, den, idCol, textCol, shingleN) = (1L, 2L, "doc_id", "text", 3)
    import org.apache.spark.sql.expressions.Window
    val jaccardCountsUdf = udf((a: String, b: String, n: Int) => {
      val (inter, union) = datapipe.Hashing.jaccardCounts(
        datapipe.Hashing.shingleSet(if (a == null) "" else a, n),
        datapipe.Hashing.shingleSet(if (b == null) "" else b, n))
      (inter.toLong, union.toLong)
    })
    val base = graft.util.Par.ensure(docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0))
    val shg = base
      .select(col(idCol).as("id"),
        datapipe.Contamination.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val st = shg.select(col("id"), size(col("sh")).cast("long").as("n"),
      explode(col("sh")).as("s"))
    println("===== STAGE st (shingle postings) =====")
    st.explain("formatted")
    val stp = st.persist()
    val dfreq = stp.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val pos = stp.join(dfreq, "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("df"), col("s"))).cast("long"))
      .filter(col("rn") <=
        col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1L)
      .select(col("s"), col("id"), col("n"))
    val a = pos.select(col("s"), col("id").as("id_a"), col("n").as("na"))
    val b = pos.select(col("s"), col("id").as("id_b"), col("n").as("nb"))
    val cands = a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        lit(den) * least(col("na"), col("nb")) >=
          lit(num) * greatest(col("na"), col("nb")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    println("===== STAGE candidates (prefix join, NO position filter) =====")
    cands.explain("formatted")
    val txt = docs.select(col(idCol).as("jid"), col(textCol).as("jtext"))
    val out = cands
      .join(txt, col("id_a") === col("jid")).withColumnRenamed("jtext", "text_a").drop("jid")
      .join(txt, col("id_b") === col("jid")).withColumnRenamed("jtext", "text_b").drop("jid")
      .withColumn("jc", jaccardCountsUdf(col("text_a"), col("text_b"), lit(shingleN)))
      .select(col("id_a"), col("id_b"),
        col("jc._1").as("n_inter"), col("jc._2").as("n_union"))
      .filter(lit(den) * col("n_inter") >= lit(num) * col("n_union"))
    println("===== STAGE verify (text re-shingle UDF per pair) =====")
    out.explain("formatted")
    println("===== COUNTS =====")
    println("cands=" + cands.count() + " out=" + out.count())
    spark.stop()
  }
}
