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

  test("assignSplit labels agree with band filters row-for-row") {
    val df = ids(6000)
    val cuts = Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)
    val got = Sampling.assignSplit(df, "id", cuts, salt = "s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 6000) // every row labeled, exactly once
    val train = Sampling.band(df, "id", 0.0, 0.8, salt = "s")
      .collect().map(_.getLong(0)).toSet
    val valid = Sampling.band(df, "id", 0.8, 0.9, salt = "s")
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 == "train").keySet == train)
    assert(got.filter(_._2 == "val").keySet == valid)
    assert(got.filter(_._2 == "test").keySet ==
      (1 to 6000).map(_.toLong).toSet -- train -- valid)
  }

  test("assignSplit rejects unsorted or incomplete cuts") {
    val df = ids(10)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", Seq("val" -> 0.9, "train" -> 0.8,
        "test" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", Seq("train" -> 0.8))
    }
  }

  test("weightedTopK is deterministic and partition-invariant") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i.toLong, (i % 100 + 1).toLong))
      .toDF("id", "w")
    val a = Sampling.weightedTopK(df, "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedTopK(df.repartition(11), "id", "w", k = 200)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size == 200)
  }

  test("weightedTopK selection probability scales with weight") {
    import spark.implicits._
    // two weight classes 10:1 — heavy rows should dominate the sample
    val df = (1 to 4000).map(i => (i.toLong, if (i <= 2000) 10L else 1L))
      .toDF("id", "w")
    val got = Sampling.weightedTopK(df, "id", "w", k = 400)
      .collect().map(_.getLong(0))
    val heavy = got.count(_ <= 2000)
    assert(heavy > 300, s"heavy=$heavy of 400") // E[heavy] ≈ 385
    // zero/negative weights are never sampled
    val withZero = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) 0L else 5L))
      .toDF("id", "w")
    val z = Sampling.weightedTopK(withZero, "id", "w", k = 100)
      .collect().map(_.getLong(0))
    assert(z.length == 50 && z.forall(_ % 2 == 1))
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
