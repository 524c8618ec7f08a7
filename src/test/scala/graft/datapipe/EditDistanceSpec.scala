package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked pairs equal brute force within blocks") {
    val rows = Seq(
      (1L, "small ring", "A"), (2L, "small rang", "A"), (3L, "small ringgg", "A"),
      (4L, "blue bolt", "A"), (5L, "small ring", "B"), (6L, "smal ring", "B"),
      (7L, "totally different", "B"))
    val df = rows.toDF("id", "name", "blk")
    val got = EditDistance.nearMatchPairs(df, "id", "name", "blk", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ia, sa, ba) <- rows; (ib, sb, bb) <- rows
      if ba == bb && ia < ib
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want)
    // cross-block near-identical strings (1 vs 5) must NOT pair
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L))
  }

  test("length band never loses a pair (edit of d changes length by <= d)") {
    val df = Seq(
      (1L, "abc", "X"), (2L, "abcde", "X"), // len diff 2 = maxDist, dist 2
      (3L, "abcdef", "X"),                  // len diff 3 from id 1: pruned, dist 3 anyway
    ).toDF("id", "name", "blk")
    val got = EditDistance.nearMatchPairs(df, "id", "name", "blk", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L), (2L, 3L, 1L)))
  }
}
