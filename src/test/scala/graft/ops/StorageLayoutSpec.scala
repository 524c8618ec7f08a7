package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Storage-layout behaviors that carry the 100 TB design: hive-style
  * partitioned writes with partition pruning at the scan, and bucketed
  * tables whose co-located join plans with NO exchange. Small data,
  * but the plan shapes asserted here are exactly what changes at
  * scale. */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partitionBy write + partition pruning: filtered scan lists only matching dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1 to 1000).map(i => (i.toLong, 1995 + i % 4, s"v$i"))
      .toDF("id", "year", "payload")
    df.write.mode("overwrite").partitionBy("year").parquet(dir)

    // hive-style layout on disk: year=1995 ... year=1998
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subdirs == Set("year=1995", "year=1996", "year=1997", "year=1998"))

    val read = spark.read.parquet(dir).filter(col("year") === 1997)
    assert(read.count() == 250)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    // the partition filter must prune at planning time (PartitionFilters,
    // not a post-scan Filter), and the pruned scan reads 1 of 4 dirs
    assert(scan.contains("PartitionFilters") && scan.contains("year"), scan)
    val files = read.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("year=1997")), files.toSeq)
  }

  test("bucketed tables: equi-join on the bucket key plans with zero exchanges") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "fv")
    val dims = (1 to 300).map(i => (i.toLong % 100, s"d$i")).toDF("k", "dv")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_facts")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_dims")

    val j = spark.table("bucketed_facts")
      .join(spark.table("bucketed_dims").hint("merge"), Seq("k"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // correctness: same result as the unbucketed join
    val expected = facts.join(dims, Seq("k")).count()
    assert(j.count() == expected)

    spark.sql("DROP TABLE bucketed_facts")
    spark.sql("DROP TABLE bucketed_dims")
  }

  test("dynamic partition pruning: dim-filtered join prunes fact partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    (1 to 2000).map(i => (i.toLong, i % 10, i * 2L))
      .toDF("id", "part_key", "measure")
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real scan: a LocalRelation folds its filter
    // into the relation and DPP no longer sees a selective predicate
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    (0 to 9).map(k => (k, if (k < 2) "keep" else "drop"))
      .toDF("dk", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // at toy sizes DPP's cost model says "not worth it" — raise the
    // fallback ratio so the planner applies it (real fact tables pass
    // the benefit check on their own statistics)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000")
    try {
      val q = fact.join(dim, col("part_key") === col("dk"))
        .filter(col("tag") === "keep")
      // 2 of 10 partitions survive: 400 fact rows
      assert(q.count() == 400)
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).find(_.contains("PartitionFilters")).getOrElse("")
      // dynamicpruning expression present in the fact scan's partition
      // filters (Spark's DPP — subquery-driven runtime pruning)
      assert(scan.contains("dynamicpruning"), scan)
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("AQE skew join: a hot key is split across multiple tasks at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // one hot key (0) with ~50k rows, 50 cold keys with ~200 each
    (1 to 60000).map(i => (if (i <= 50000) 0L else i.toLong % 50 + 1, s"payload$i"))
      .toDF("k", "v").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/big")
    (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "dv")
      .write.mode("overwrite").parquet(s"$dir/dim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val j = spark.read.parquet(s"$dir/big")
        .join(spark.read.parquet(s"$dir/dim"), Seq("k"))
      // execute THIS dataset's plan (count() would run a different
      // queryExecution and leave j's adaptive plan un-finalized)
      assert(j.collect().length == 60000) // correctness unaffected
      // after execution the adaptive plan marks the skewed join
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
    } finally {
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled")
        .foreach(spark.conf.unset)
    }
  }

  test("runtime bloom filter: selective dim side injects bloom_filter_might_contain on the fact scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (1 to 20000).map(i => (i.toLong % 2000, s"f$i")).toDF("k", "fv")
      .write.mode("overwrite").parquet(s"$dir/facts")
    (1 to 2000).map(i => (i.toLong, i % 7)).toDF("k", "attr")
      .write.mode("overwrite").parquet(s"$dir/dims")
    // thresholds sized for toy data; at scale the defaults (10 MB
    // creation side) gate the same rewrite
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.read.parquet(s"$dir/facts")
      val dims = spark.read.parquet(s"$dir/dims").filter(col("attr") === 3)
      val j = facts.join(dims, Seq("k"))
      val plan = j.queryExecution.optimizedPlan.toString
      // the runtime filter rewrites the fact side to
      // might_contain(bloom_filter_agg(dim keys), xxhash64(k))
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"), plan)
      // and the join result is unaffected by the filter
      assert(j.count() ==
        facts.join(spark.read.parquet(s"$dir/dims").filter(col("attr") === 3),
          Seq("k"), "inner").count())
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
