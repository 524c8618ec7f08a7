package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def keyed(n: Int, dups: Int = 3) = {
    import spark.implicits._
    (1 to n).flatMap(i => Seq.fill(dups)(i.toLong)).toDF("k")
  }

  test("small distinct sets are exact") {
    val r = Sketches.kmvDistinct(keyed(100), "k", k = 256).head()
    assert(r.getAs[Long]("n_kept") == 100)
    assert(r.getAs[Double]("est_distinct") == 100.0)
  }

  test("estimate is within the ~1/sqrt(k) error bound") {
    val n = 20000
    val r = Sketches.kmvDistinct(keyed(n), "k", k = 256).head()
    assert(r.getAs[Long]("n_kept") == 256)
    val est = r.getAs[Double]("est_distinct")
    // 4 standard errors at k=256 -> +/- 25%
    assert(math.abs(est - n) < n * 0.25, s"est=$est for n=$n")
  }

  test("sketch is invariant to partitioning (mergeable partial agg)") {
    val df = keyed(5000)
    val a = Sketches.kmvDistinct(df, "k", 64).collect().toSeq
    val b = Sketches.kmvDistinct(df.repartition(13), "k", 64).collect().toSeq
    val c = Sketches.kmvDistinct(df.coalesce(1), "k", 64).collect().toSeq
    assert(a == b && b == c)
  }

  test("duplicates do not change the sketch") {
    import spark.implicits._
    val once = (1 to 1000).map(_.toLong).toDF("k")
    val many = keyed(1000, dups = 7)
    assert(Sketches.kmvDistinct(once, "k", 128).collect().toSeq ==
      Sketches.kmvDistinct(many, "k", 128).collect().toSeq)
  }

  test("nulls are ignored") {
    import spark.implicits._
    val withNulls = (1 to 50).map(i => Some(i.toLong)).toDF("k")
      .unionByName(Seq(Option.empty[Long], Option.empty[Long]).toDF("k"))
    val r = Sketches.kmvDistinct(withNulls, "k", 256).head()
    assert(r.getAs[Long]("n_kept") == 50)
  }

  def termStream(counts: (String, Int)*) = {
    import spark.implicits._
    counts.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("term")
  }

  test("CMS point queries are exact when buckets do not collide") {
    import spark.implicits._
    val counts = (1 to 20).map(i => s"term$i" -> i)
    val items = termStream(counts: _*)
    val sk = Sketches.cmsSketch(items, "term", depth = 4, width = 1024)
    val est = Sketches.cmsEstimate(sk, counts.map(_._1).toDF("term"),
        "term", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (t, n) => assert(est(t) == n.toLong, t) }
  }

  test("CMS never undercounts, even under forced collisions") {
    import spark.implicits._
    val counts = ('a' to 'j').zipWithIndex.map { case (c, i) => c.toString -> (i + 1) }
    val items = termStream(counts: _*)
    // width 2 forces heavy collisions; the one-sided bound must hold
    val sk = Sketches.cmsSketch(items, "term", depth = 2, width = 2)
    val probes = (counts.map(_._1) :+ "absent").toDF("term")
    val est = Sketches.cmsEstimate(sk, probes, "term", depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (t, n) => assert(est(t) >= n.toLong, t) }
    assert(est("absent") >= 0L)
    // with everything in 2 buckets, SOME probe must overestimate
    assert(counts.exists { case (t, n) => est(t) > n.toLong })
  }

  test("CMS sketch is invariant to partitioning (mergeable partial agg)") {
    val items = termStream((1 to 50).map(i => s"t$i" -> (i % 7 + 1)): _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsSketch(df, "term").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(items) == rows(items.repartition(13)))
    assert(rows(items) == rows(items.coalesce(1)))
  }

  test("merge keeps k smallest distinct across buffers") {
    val agg = new Sketches.KmvAgg(4)
    val a = Array(1L, 5L, 9L, 12L)
    val b = Array(2L, 5L, 7L)
    assert(agg.merge(a, b).toSeq == Seq(1L, 2L, 5L, 7L))
    assert(agg.merge(b, a).toSeq == Seq(1L, 2L, 5L, 7L))
    assert(agg.merge(Array.emptyLongArray, a).toSeq == a.toSeq)
    // reduce: ignores values above the kth once full
    assert(agg.reduce(Array(1L, 2L, 3L, 4L), 99L).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(agg.reduce(Array(1L, 2L, 3L, 4L), 0L).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(agg.reduce(Array(1L, 2L, 3L, 4L), 2L).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  def hllMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Sketches.hllRegisters(df, "k", "t").collect()
      .map(r => r.getAs[Long]("idx") -> r.getAs[Long]("m")).toMap

  test("HLL registers match an independent md5 bit-walk") {
    import spark.implicits._
    val keys = (1 to 200).map(_.toString)
    // independent mirror: java MessageDigest, BigInt hex parse, bit ops
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = keys.map { k =>
      val hex = md.digest(k.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val idx = h >>> Sketches.HllRestBits
      val rest = h & ((1L << Sketches.HllRestBits) - 1)
      val rho = if (rest == 0) Sketches.HllRhoMax.toLong
        else Sketches.HllRestBits - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      idx -> rho
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(hllMap(keys.map(k => k.toLong).toDF("k")) == expect)
  }

  test("HLL registers are invariant to partitioning and duplicates") {
    import spark.implicits._
    val once = (1 to 1000).map(_.toLong).toDF("k")
    val dup = (1 to 1000).flatMap(i => Seq.fill(4)(i.toLong)).toDF("k")
    assert(hllMap(once) == hllMap(once.repartition(13)))
    assert(hllMap(once) == hllMap(dup))
  }

  test("keyed KMV one-pass sketch equals a per-slice KmvAgg run") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => (s"g${i % 3}", i.toLong))
    val keyed = rows.toDF("g", "x")
      .select(col("g"), Sketches.kmvHash(col("x")).as("h"))
      .as[(String, Long)].groupByKey(_._1)
      .agg(Sketches.kmvSketchKeyed(16).name("mins"))
      .collect().toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = rows.filter(_._1 == g).map(_._2).toDF("x")
        .select(Sketches.kmvHash(col("x")).as("h")).as[Long]
        .select(Sketches.kmvSketch(16).name("mins"))
        .head()
      assert(keyed(g).toSeq == slice.toSeq, g)
    }
  }

  test("KMV union sketch is exactly the k smallest of the merged sets") {
    // the Beyer et al. identity the q146 estimator rests on: the k
    // smallest hashes of A ∪ B are recoverable from the two sketches
    val hashes = (1 to 800).map(i => (i * 2654435761L) & ((1L << 60) - 1))
    val (a, b) = (hashes.take(500).distinct, hashes.drop(300).distinct)
    val agg = new Sketches.KmvAgg(32)
    def sketch(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(sketch(a), sketch(b))
    assert(merged.toSeq == (a ++ b).distinct.sorted.take(32))
  }

  test("HLL merge is register-wise max") {
    import spark.implicits._
    val a = (1 to 500).map(_.toLong).toDF("k")
    val b = (400 to 900).map(_.toLong).toDF("k")
    val merged = hllMap(a.unionByName(b))
    val ma = hllMap(a); val mb = hllMap(b)
    val expect = (ma.keySet ++ mb.keySet)
      .map(j => j -> math.max(ma.getOrElse(j, 0L), mb.getOrElse(j, 0L))).toMap
    assert(merged == expect)
  }
}
