package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe._
import graft.queries.DataPipeQueries
import graft.util.Tables

/** Stage-level profile of the q103 capstone funnel (diagnostic main,
  * not part of the driver contract) — times the expensive stage
  * boundaries (dedup survivor chain, quantizer training, cosine pair
  * search, and the repeat-evaluation cost of each) the way
  * [[DataPipeProfile]] decomposes q13, so a funnel slowdown can be
  * attributed to a stage or to a missing materialization cut instead
  * of "q103 got slower". The stages here are built WITHOUT the
  * funnel's localCheckpoint cuts, so eval-1 vs eval-2 lines expose
  * what re-evaluation of an uncut chain costs. */
object FunnelProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val gated = docs.filter(col("lang") === "en")
    val okIds = QualityScore.metrics(gated)
      .filter(col("n_tokens") >= 30 &&
        col("n_punct") < lit(0.2) * col("n_chars_measured"))
      .select(col("doc_id"))
    val qual = gated.join(okIds, Seq("doc_id"), "left_semi")
    val decon = Contamination.decontaminate(
      qual.filter(col("doc_id") % 97 =!= 0),
      qual.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 3, minShared = 2L)
    val surv = DedupOps.minhashDedupSurvivors(decon, minJaccard = 0.5, md5Based = true)
    t("surv.count (upstream once)")(surv.count())
    t("surv.count AGAIN")(surv.count())
    val emb = Tables.embeddings(spark, d)
    val assign = t("kmeansAssign build (train k=8)")(
      Clustering.kmeansAssign(emb, k = 8, iters = 3).select(col("vec_id"), col("cluster")))
    t("assign.count")(assign.count())
    val embSurv = emb.join(surv.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val nCells = t("embSurv.count")(math.max(8, math.sqrt(embSurv.count().toDouble).toInt))
    println(s"nCells=$nCells")
    val cosPairs = t("cosineNearDupPairs build (train+stats)")(
      Similarity.cosineNearDupPairs(embSurv, threshold = 0.45, nCells = nCells))
    t("cosPairs.count (eval 1)")(cosPairs.count())
    t("cosPairs.count (eval 2)")(cosPairs.count())
    // count, not collect: the profile needs the wall time + row count,
    // never the rows on the driver
    t("full q103")(DataPipeQueries.llmFunnel(spark, d).count())
    spark.stop()
  }
}
