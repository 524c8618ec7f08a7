package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Zipf-ish skewed terms: term t_i appears ~n/i times. */
  def terms(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      var rank = 1
      var acc = n / rank
      while (i > acc) { rank += 1; acc += math.max(n / rank, 1) }
      s"t$rank"
    }.toDF("term")
  }

  def naive(df: org.apache.spark.sql.DataFrame, num: Long, denom: Long) = {
    val total = df.count()
    df.groupBy("term").count()
      .filter(col("count") * denom >= lit(total) * num)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches the exact groupBy result on skewed data") {
    val df = terms(20000)
    val got = HeavyHitters.frequentTerms(df, "term", 1, 100, 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive(df, 1, 100))
    assert(got.nonEmpty)
  }

  test("result is independent of partitioning (MG merge path)") {
    val df = terms(12000)
    val a = HeavyHitters.frequentTerms(df.repartition(17), "term", 1, 50, 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = HeavyHitters.frequentTerms(df.coalesce(1), "term", 1, 50, 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a == naive(df, 1, 50))
  }

  test("MG summary never loses an above-threshold term (unit)") {
    val agg = new HeavyHitters.MgAgg(9) // guarantee bound: > n/10
    // 100 items: "hot" 30 times, 70 distinct fillers
    val stream = Seq.fill(30)("hot") ++ (1 to 70).map(i => s"f$i")
    // adversarial order: fillers interleaved around the hot items
    val shuffled = stream.sortBy(_.hashCode)
    val buf = shuffled.foldLeft(agg.zero)(agg.reduce)
    assert(buf.contains("hot")) // 30 > 100/10
    assert(buf.size <= 9)
    // merge keeps the guarantee: two halves reduced separately
    val (h1, h2) = shuffled.splitAt(53)
    val merged = agg.merge(
      h1.foldLeft(agg.zero)(agg.reduce), h2.foldLeft(agg.zero)(agg.reduce))
    assert(merged.contains("hot"))
    assert(merged.size <= 9)
  }

  test("sketchK too small for the threshold is rejected") {
    val df = terms(100)
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTerms(df, "term", 1, 100, 50)
    }
  }
}
