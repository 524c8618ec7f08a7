package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** q101: split-by-component must make the q88 leakage audit vacuous. */
class LeakFreeSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.01"

  test("no near-dup pair straddles the component-hash split") {
    val splits = DataPipeQueries.leakFreeSplit(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val pairs = graft.datapipe.DedupOps.minhashNearDupPairs(
      graft.util.Tables.documents(spark, sfDir), minJaccard = 0.5,
      md5Based = true)
    val straddling = pairs
      .join(splits.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), Seq("id_a"))
      .join(splits.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
    assert(pairs.count() > 0, "corpus should contain planted near-dups")
    assert(straddling.count() == 0,
      "component-hash splits must place every near-dup pair in one split")
    // the per-doc-hash split (q77/q88) DOES leak on this corpus — the
    // fix is doing real work, not passing vacuously
    assert(DataPipeQueries.splitLeakage(spark, sfDir).count() > 0)
  }

  test("split proportions stay near the cuts despite component grouping") {
    val bySplit = DataPipeQueries.leakFreeSplit(spark, sfDir)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = bySplit.values.sum.toDouble
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9, bySplit)
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit)
  }
}
