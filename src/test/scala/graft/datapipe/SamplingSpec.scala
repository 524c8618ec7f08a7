package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ids(n: Int) = {
    import spark.implicits._
    (1 to n).map(_.toLong).toDF("id")
  }

  test("uniform sample is deterministic and close to the fraction") {
    val df = ids(10000)
    val a = Sampling.uniform(df, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.uniform(df, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b) // same rows every run
    assert(math.abs(a.size - 2500) < 150, s"got ${a.size}")
  }

  test("partitioning does not change the sample (unlike df.sample)") {
    val df = ids(5000)
    val a = Sampling.uniform(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.uniform(df.repartition(7), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("bands partition the corpus: train/val/test disjoint and complete") {
    val df = ids(8000)
    val train = Sampling.band(df, "id", 0.0, 0.8).collect().map(_.getLong(0)).toSet
    val valid = Sampling.band(df, "id", 0.8, 0.9).collect().map(_.getLong(0)).toSet
    val test_ = Sampling.band(df, "id", 0.9, 1.0).collect().map(_.getLong(0)).toSet
    assert((train & valid).isEmpty && (train & test_).isEmpty && (valid & test_).isEmpty)
    assert(train.size + valid.size + test_.size == 8000)
    // nested property: a narrower band is a subset of a wider one
    assert(Sampling.band(df, "id", 0.0, 0.5).collect().map(_.getLong(0)).toSet
      .subsetOf(train))
  }

  test("full fraction keeps every row, including max-prefix keys") {
    // regression: hexThreshold(1.0) used to be "ffffffff" and strict
    // '<' dropped rows whose md5 prefix is exactly ffffffff
    assert(Sampling.hexThreshold(1.0) > "ffffffff")
    assert(Sampling.hexThreshold(0.9999) <= "ffffffff")
    val df = ids(5000)
    assert(Sampling.uniform(df, "id", 1.0).count() == 5000)
    assert(Sampling.band(df, "id", 0.0, 1.0).count() == 5000)
  }

  test("different salts give independent splits") {
    val df = ids(8000)
    val a = Sampling.uniform(df, "id", 0.5, salt = "epoch1")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.uniform(df, "id", 0.5, salt = "epoch2")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
    // independence: |a ∩ b| ≈ n/4
    assert(math.abs((a & b).size - 2000) < 200, s"${(a & b).size}")
  }

  test("stratified fractions apply per stratum with default fallback") {
    import spark.implicits._
    val df = (1 to 9000).map(i => (i.toLong, Seq("en", "de", "zh")(i % 3)))
      .toDF("id", "lang")
    val got = Sampling.stratified(df, "lang", "id",
      Map("en" -> 0.5, "zh" -> 0.1), defaultFraction = 0.25)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 1500) < 120, byLang.toString)
    assert(math.abs(byLang("zh") - 300) < 90, byLang.toString)
    assert(math.abs(byLang("de") - 750) < 110, byLang.toString)
    // per-row: every kept row satisfies its stratum threshold; the en
    // subset equals a uniform 0.5 sample of the en stratum
    val enOnly = Sampling.uniform(df.filter(col("lang") === "en"), "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.filter(col("lang") === "en").select("id")
      .collect().map(_.getLong(0)).toSet == enOnly)
  }
}
