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
}
