package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Step-level profile of the iterative graph family (diagnostic main,
  * not part of the driver contract) — the round-18 instrument for the
  * 32-core anti-scaling investigation (VERDICT r17 #1). Measures the
  * per-step cost of the q149 walk loop and q143 PageRank loop under
  * variants: baseline (loop relations inherit shuffle.partitions =
  * cpus), volume-sized partitioning (the PageRank nPart convention),
  * and non-eager lineage cuts.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.GraphProfile"
  */
object GraphProfile {
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

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GP $tag: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

    import org.apache.spark.sql.expressions.Window

    // ---- Random walks variants (q149 shape) ----
    // variant: (sizedParts, eagerCheckpoint)
    for ((sized, eager) <- Seq((false, true), (true, true), (true, false),
        (false, true), (true, false))) {
      println(s"=== walks sized=$sized eager=$eager (cpus=$cpus) ===")
      val tAll0 = System.nanoTime()
      val edges = purchaseGraph().persist()
      val nEdges = t("edges_count")(edges.count())
      val nPart = math.max(1,
        math.min(spark.sparkContext.defaultParallelism,
          (nEdges / 250000L).toInt + 1))
      val adj = t("adj_build") {
        val pre = if (sized) edges.repartition(nPart, col("src")) else edges
        val a = pre
          .withColumn("idx", row_number().over(
            Window.partitionBy(col("src")).orderBy(col("dst")))
            .cast("long") - 1L)
          .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
          .persist()
        a.count(); a
      }
      edges.unpersist()
      var state = adj.select(col("src").as("walk"), col("src").as("node"))
        .distinct().localCheckpoint(true)
      val frames = scala.collection.mutable.ArrayBuffer(
        state.select(col("walk"), lit(0).as("step"), col("node")))
      for (st <- 1 to 8) {
        val t0 = System.nanoTime()
        val sel = graft.datapipe.Sketches.kmvHash(
          concat(lit("w"), col("walk").cast("string"), lit(s":$st")))
        val state2 = state.select(col("walk"), col("node"), sel.as("__sel"))
        state = state2
          .join(adj, col("node") === col("src") &&
            col("idx") === col("__sel") % col("deg"))
          .select(col("walk"), col("dst").as("node"))
          .localCheckpoint(eager)
        frames += state.select(col("walk"), lit(st).as("step"), col("node"))
        println(f"GP   step$st: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
      t("union_count")(frames.reduce(_ unionByName _).count())
      adj.unpersist()
      println(f"GP walks_total sized=$sized eager=$eager: ${(System.nanoTime() - tAll0) / 1e9}%.3fs")
    }

    // ---- PageRank variants (q143 shape) ----
    for (eager <- Seq(true, false, true, false)) {
      println(s"=== pagerank eager=$eager (cpus=$cpus) ===")
      val tAll0 = System.nanoTime()
      val raw = purchaseGraph().persist()
      val nEdges = raw.count()
      val nPart = math.max(1,
        math.min(spark.sparkContext.defaultParallelism,
          (nEdges / 250000L).toInt + 1))
      val deg = raw.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
      val n = deg.count()
      val edges = raw.join(broadcast(deg), "src")
        .select(col("src"), col("dst"), col("deg"))
        .repartition(nPart).persist()
      edges.count()
      raw.unpersist()
      val Fp = 1L << 40
      val baseCol = lit((15L * Fp) / (100L * n))
      var ranks = deg.select(col("src").as("node"), lit(Fp / n).as("r"))
        .localCheckpoint(true)
      for (it <- 1 to 16) {
        val t0 = System.nanoTime()
        val next = edges.join(broadcast(ranks), col("src") === col("node"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy(col("dst"))
          .agg((baseCol + expr("(85 * sum(c)) div 100")).as("r"))
          .select(col("dst").as("node"), col("r"))
        ranks = next.localCheckpoint(eager)
        println(f"GP   iter$it: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
      t("final_count")(ranks.count())
      deg.unpersist(); edges.unpersist()
      println(f"GP pr_total eager=$eager: ${(System.nanoTime() - tAll0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
