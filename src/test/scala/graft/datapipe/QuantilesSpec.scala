package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def df(vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF("v")
  }

  test("kth smallest equals the sorted order statistic, negatives included") {
    // deterministic mix spanning both signs and repeated values
    val vs = (1 to 500).map(i => (i * 2654435761L) % 10007 - 5000)
    val sorted = vs.sorted
    val d = df(vs)
    for (k <- Seq(1, 2, 117, 250, 499, 500))
      assert(Quantiles.kthSmallest(d, "v", k) == sorted(k - 1), s"k=$k")
  }

  test("extreme magnitudes exercise every byte of the radix walk") {
    val vs = Seq(Long.MinValue, -1L, 0L, 1L, 255L, 256L, 65536L,
      Long.MaxValue, Long.MaxValue - 1)
    val sorted = vs.sorted
    val d = df(vs)
    for (k <- 1 to vs.length)
      assert(Quantiles.kthSmallest(d, "v", k) == sorted(k - 1), s"k=$k")
  }

  test("duplicates: the k-th statistic lands inside the run") {
    val d = df(Seq(5L, 5L, 5L, 1L, 9L))
    assert(Quantiles.kthSmallest(d, "v", 1) == 1L)
    assert(Quantiles.kthSmallest(d, "v", 3) == 5L)
    assert(Quantiles.kthSmallest(d, "v", 5) == 9L)
  }

  test("k beyond the non-null count is rejected") {
    intercept[IllegalArgumentException] {
      Quantiles.kthSmallest(df(Seq(1L, 2L)), "v", 3)
    }
  }

  test("exactQuantiles ranks at ceil(q*n)") {
    val vs = (1 to 100).map(_.toLong)
    val got = Quantiles.exactQuantiles(df(vs), "v",
        Seq("p50" -> 0.5, "p99" -> 0.99, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("p50") == ((50L, 50L)))
    assert(got("p99") == ((99L, 99L)))
    assert(got("p100") == ((100L, 100L)))
  }
}
