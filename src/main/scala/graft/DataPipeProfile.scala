package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the near-dup dedup path (diagnostic main,
  * not part of the driver contract) — decomposes q13's cost the way
  * [[BenchProfile]] decomposes the MEDLINE pipeline: tokenize+shingle
  * / +signature+bands / +candidate join / +exact verify, for both the
  * fnv fast path and the md5 oracle-portable path, so a slowdown can
  * be attributed to a stage instead of "the query". Run on the sf dir
  * in SPARK_GRAFT_SF_DIR (default sf0.1). */
object DataPipeProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = util.Tables.documents(spark, sfDir)

    def time(tag: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"PROFILE $tag: ${best._1}%.2fs n=${best._2}")
    }

    for (md5 <- Seq(false, true)) {
      val label = if (md5) "md5" else "fnv"
      time(s"$label bands_only") {
        datapipe.DedupOps.minhashIndex(docs, md5Based = md5).count()
      }
      time(s"$label bands+candidates") {
        datapipe.DedupOps.minhashCandidates(docs, md5Based = md5).count()
      }
      time(s"$label full_verify (q13 shape)") {
        datapipe.DedupOps.minhashNearDupPairs(docs, minJaccard = 0.5,
          md5Based = md5).count()
      }
    }
    time("simhash pairs") {
      datapipe.DedupOps.simhashNearDupPairs(docs, maxHamming = 3,
        md5Based = true).count()
    }
    // BPE trainer shapes: pure sequential (one merge per driver
    // round-trip) vs batched admission (top-64 collect per round,
    // provably identical table — see Bpe.admitBatch). The gap is the
    // round-trip saving that dominates at production vocab sizes.
    val hist = datapipe.Bpe.wordHistogram(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hist.count()
    time("bpe train 24 merges sequential (batchTopK=1)") {
      datapipe.Bpe.train(hist, 24, batchTopK = 1).size.toLong
    }
    time("bpe train 24 merges batched (batchTopK=64)") {
      datapipe.Bpe.train(hist, 24).size.toLong
    }
    hist.unpersist()
    spark.stop()
  }
}
