package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // hot key: 10k rows of key=1, few of others
    val big = (Seq.fill(10000)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val small = (1 to 50).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty)
    assert(plain.exceptAll(salted).isEmpty)
  }

  test("salted collect aggregation merges to the same multiset") {
    import spark.implicits._
    val df = (Seq.fill(5000)(1) ++ Seq.fill(10)(2)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val out = Skew.saltedAgg(df, "k", nSalts = 8)(
      partial = g => g.agg(collect_list(col("v")).as("vs")),
      merge = g => g.agg(flatten(collect_list(col("vs"))).as("vs")))
    val sizes = out.select(col("k"), size(col("vs")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(sizes == Map(1 -> 5000, 2 -> 10))
  }
}
