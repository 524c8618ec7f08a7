package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for plans/r17: the ROUND-17 (optimized) internal
  * stage plans of ppjoinExact — UDF postings build, PPJoin position
  * filter, hash-array verify. Diagnostic main. */
object PpjoinPlanDumpNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = util.Tables.documents(spark, "/root/testdata/sf0.1")
    val (num, den, idCol, textCol, shingleN) = (1L, 2L, "doc_id", "text", 3)
    val st = datapipe.DedupOps.shingledPostings(docs, idCol, textCol, shingleN)
    println("===== STAGE st (shingle postings) =====")
    st.explain("formatted")
    val stp = st.persist()
    val dfreq = stp.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val pos = datapipe.DedupOps.prefixPostings(stp, dfreq, num, den)
    val a = pos.select(col("s"), col("id").as("id_a"), col("n").as("na"),
      col("rn").as("rna"))
    val b = pos.select(col("s"), col("id").as("id_b"), col("n").as("nb"),
      col("rn").as("rnb"))
    val cands = a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        lit(den) * least(col("na"), col("nb")) >=
          lit(num) * greatest(col("na"), col("nb")) &&
        lit(num + den) * (lit(1L) +
          least(col("na") - col("rna"), col("nb") - col("rnb"))) >=
          lit(num) * (col("na") + col("nb")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    println("===== STAGE candidates (prefix join + position filter) =====")
    cands.explain("formatted")
    val hashArr = udf((t: String) =>
      datapipe.Hashing.shingleSet(if (t == null) "" else t, shingleN))
    val hashes = docs
      .select(col(idCol).as("jid"), hashArr(col(textCol)).as("jh"))
    val out = cands
      .join(hashes, col("id_a") === col("jid"))
      .withColumnRenamed("jh", "h_a").drop("jid")
      .join(hashes, col("id_b") === col("jid"))
      .withColumnRenamed("jh", "h_b").drop("jid")
      .withColumn("jc",
        graft.functions.Expressions.jaccard_pack(col("h_a"), col("h_b")))
      .select(col("id_a"), col("id_b"),
        shiftrightunsigned(col("jc"), 32).as("n_inter"),
        col("jc").bitwiseAND(lit(0xffffffffL)).as("n_union"))
      .filter(lit(den) * col("n_inter") >= lit(num) * col("n_union"))
    println("===== STAGE verify (hash-array merge, codegen jaccard_pack) =====")
    out.explain("formatted")
    println("===== COUNTS =====")
    println("cands=" + cands.count() + " out=" + out.count())
    spark.stop()
  }
}
