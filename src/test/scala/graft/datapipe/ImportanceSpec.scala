package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.{Expressions, Log2FixedExpr}
import org.apache.spark.sql.functions._

/** [[graft.functions.Log2FixedExpr]] and [[Importance]] — the exact
  * fixed-point log2 and the DSIR importance-weight operator built on
  * it. */
class ImportanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("log2Fixed matches true log2 within 2 Q16 ulps across the domain") {
    val xs = Seq(1L, 2L, 3L, 7L, 1000L, 65536L, 123456789L,
      (1L << 42) - 1, 999999937L)
    for (x <- xs) {
      val got = Log2FixedExpr.log2Fixed(x, 16)
      val want = math.log(x.toDouble) / math.log(2.0) * 65536.0
      assert(math.abs(got - want) <= 2.0, s"x=$x got=$got want=$want")
    }
  }

  test("log2Fixed is within 2 ulps and monotone on 10k pseudorandom inputs") {
    var h = 0x9e3779b97f4a7c15L
    val xs = (1 to 10000).map { _ =>
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      (h & ((1L << 42) - 1)) max 1L
    }.distinct.sorted
    val lg2 = math.log(2.0)
    var prev = -1L
    for (x <- xs) {
      val got = Log2FixedExpr.log2Fixed(x, 16)
      val want = math.log(x.toDouble) / lg2 * 65536.0
      assert(math.abs(got - want) <= 2.0, s"x=$x got=$got want=$want")
      assert(got >= prev, s"monotonicity broke at x=$x")
      prev = got
    }
  }

  test("log2Fixed column path equals the driver twin and rejects the domain edge") {
    import spark.implicits._
    val xs = Seq(1L, 5L, 31L, 1L << 20, (1L << 42) - 1)
    val got = xs.toDF("x")
      .select(Expressions.log2_fixed(col("x"), 16).as("lg"))
      .as[Long].collect().toSeq
    assert(got == xs.map(Log2FixedExpr.log2Fixed(_, 16)))
    intercept[Exception] {
      Seq(0L).toDF("x").select(Expressions.log2_fixed(col("x"), 16)).collect()
    }
    intercept[Exception] {
      Seq(1L << 42).toDF("x").select(Expressions.log2_fixed(col("x"), 16)).collect()
    }
  }

  test("fnv64_mask equals the driver hash under the mask") {
    import spark.implicits._
    val ss = Seq("alpha", "beta gamma", "", "Ω astral 𝔘")
    val got = ss.toDF("s")
      .select(Expressions.fnv64_mask(col("s"), 4095L).as("b"))
      .as[Long].collect().toSeq
    assert(got == ss.map(s => Hashing.fnv64(s) & 4095L))
  }

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("target == raw makes every weight exactly zero") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "delta epsilon",
      3L -> "alpha delta")
    val w = Importance.importanceWeights(d, d, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.values.forall(_ == 0L), w.toString)
  }

  test("target-like documents outscore off-target documents") {
    // raw: two sublanguages; target: only the "good" one
    val raw = docs(
      (1L, "good prose flows well"), (2L, "good prose reads well"),
      (3L, "spam spam buy now"), (4L, "buy spam now now"))
    val target = docs((10L, "good prose flows and reads well"))
    val w = Importance.importanceWeights(raw, target, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // ranking is the DSIR contract (weights are relative — absolute
    // sign shifts with the smoothing mass over unused buckets)
    assert(w(1L) > w(3L) && w(2L) > w(4L), w.toString)
  }

  test("feature stream is unigrams plus bigrams") {
    val d = docs(1L -> "a b c", 2L -> "solo", 3L -> "", 4L -> null.asInstanceOf[String])
    val n = Importance.importanceWeights(d, d, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) == 5L) // 3 unigrams + 2 bigrams
    assert(n(2L) == 1L)
    assert(n(3L) == 0L && n(4L) == 0L)
  }

  test("weights are partition-invariant") {
    val rows = (1L to 30L).map(i => i -> s"tok${i % 5} tok${i % 3} tok${i % 7}")
    val tgt = (1L to 5L).map(i => i -> s"tok${i % 5} tok1")
    val a = Importance.importanceWeights(
        docs(rows: _*).repartition(1), docs(tgt: _*).repartition(1))
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Importance.importanceWeights(
        docs(rows: _*).repartition(7), docs(tgt: _*).repartition(3))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("collected model carries target-only buckets (disjoint corpora)") {
    // raw and target share NO grams: every target bucket is absent
    // from the raw corpus. The DSIR estimator gives such a bucket
    // weight log2f(ct+1) − log2f(0+1) > 0; the collected model must
    // carry it (full-outer build), not drop it to a 0-scoring miss.
    val raw = docs(1L -> "aaa bbb", 2L -> "ccc ddd")
    val tgt = docs(10L -> "xxx yyy", 11L -> "xxx zzz")
    val B = 256
    val (model, norm) =
      Importance.importanceModelCollected(raw, tgt, buckets = B)
    def lg(x: Long) = Log2FixedExpr.log2Fixed(x, Importance.FracBits)
    // "xxx" appears twice in the target, never in raw
    val bXxx = Hashing.fnv64("xxx") & (B - 1L)
    assert(model.get(bXxx).contains(lg(3L) - lg(1L)), model.get(bXxx).toString)
    // a target-only document scores ABOVE a fully-unseen document
    val (nT, sT) = Importance.scoreRow("xxx yyy", model, norm, B)
    val (nU, sU) = Importance.scoreRow("qqq www", model, norm, B)
    assert(nT == 3L && nU == 3L)
    assert(sT > sU, s"target-like $sT should outscore unseen $sU")
    // and the batch face still scores raw docs off raw buckets only:
    // adding target-only buckets to the model must not disturb it
    val batch = Importance.importanceWeights(raw, tgt, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaModel = Seq(1L -> "aaa bbb", 2L -> "ccc ddd").map { case (id, t) =>
      id -> Importance.scoreRow(t, model, norm, B)._2
    }.toMap
    assert(batch == viaModel)
  }

  test("driver-side replay equality on a small corpus") {
    val raw = Seq(1L -> "x y z x", 2L -> "y y q", 3L -> "z q r s")
    val tgt = Seq(10L -> "x y x y", 11L -> "x z")
    val B = 128
    def feats(t: String): Seq[Long] = {
      val ts = graft.util.Tok.WsRegex.split(t.toLowerCase)
        .filter(_.nonEmpty).toSeq
      val grams = ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      grams.map(g => Hashing.fnv64(g) & (B - 1L))
    }
    val rawCnt = raw.flatMap(r => feats(r._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val tgtCnt = tgt.flatMap(r => feats(r._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    def lg(x: Long) = Log2FixedExpr.log2Fixed(x, Importance.FracBits)
    val norm = lg(rawCnt.values.sum + B) - lg(tgtCnt.values.sum + B)
    val want = raw.map { case (id, t) =>
      val fs = feats(t)
      id -> (fs.map(b => lg(tgtCnt.getOrElse(b, 0L) + 1) - lg(rawCnt(b) + 1)).sum
        + fs.size * norm)
    }.toMap
    val got = Importance.importanceWeights(docs(raw: _*), docs(tgt: _*),
        buckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
  }
}
