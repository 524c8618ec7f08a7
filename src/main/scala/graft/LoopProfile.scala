package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 diagnostic main (not part of the driver contract):
  * decomposes q147 (label propagation) and q156 (coreness) into edge
  * build vs iteration loop at the current core count, and A/B-tests
  * loop variants (two-exchange vs one-exchange LPA iteration, AQE
  * on/off for the loop only).
  */
object LoopProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    import graft.util.Tables

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LP $tag: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

    def purchaseGraph(): DataFrame = {
      val e0 = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      e0.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }

    // ---- LPA loop variants over a prebuilt edge relation ----
    // variant: 0 = current (two exchanges/iter), 1 = repartition-by-dst
    // (one exchange/iter), 2 = current with AQE off for the loop
    for (round <- 1 to 2; variant <- Seq(0, 1, 2)) {
      val raw = purchaseGraph().persist()
      val nEdges = raw.count()
      val nPart = math.max(1,
        math.min(spark.sparkContext.defaultParallelism,
          (nEdges / 250000L).toInt + 1))
      val edges = raw.repartition(nPart, col("src")).persist()
      edges.count()
      raw.unpersist()
      if (variant == 2) spark.conf.set("spark.sql.adaptive.enabled", "false")
      val tag = s"lpa_v$variant r$round"
      t(tag) {
        var labels = edges.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("label"))
          .localCheckpoint(true)
        for (_ <- 1 to 8) {
          val votes = edges.join(labels, col("src") === col("node"))
            .select(col("dst"), col("label"))
            .unionByName(labels.select(col("node").as("dst"), col("label")))
          val keyed = if (variant == 1)
            votes.repartition(nPart, col("dst")) else votes
          labels = keyed
            .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
            .groupBy(col("dst"))
            .agg(max_by(col("label"),
              struct(col("cnt"), (-col("label")).as("neg"))).as("label"))
            .select(col("dst").as("node"), col("label"))
            .localCheckpoint(true)
        }
        labels.count()
      }
      if (variant == 2) spark.conf.set("spark.sql.adaptive.enabled", "true")
      edges.unpersist()
    }

    // ---- q156 decomposition: ned chain vs coreness rounds ----
    for (round <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir)
      val edges = t(s"ned_chain r$round") {
        val e = graft.datapipe.DedupOps
          .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
          .select(col("id_a").as("u"), col("id_b").as("v"))
          .localCheckpoint(true)
        e.count(); e
      }
      t(s"coreness_rounds r$round") {
        graft.datapipe.Graph.coreness(edges, 16).count()
      }
    }
    spark.stop()
  }
}
