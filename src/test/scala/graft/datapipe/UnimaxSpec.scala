package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Packing.unimaxAllocate]] — exact-integer UniMax water-filling. */
class UnimaxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def alloc(budget: Long, epochs: Long, rows: (String, Long)*) = {
    import spark.implicits._
    Packing.unimaxAllocate(rows.toDF("source", "n_tokens"),
        "source", "n_tokens", budget, epochs)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("small sources cap at full epochs, the rest share the level exactly") {
    // caps: a=100, b=200, c=1000, d=1000; budget 1000
    // a capped (100*4 <= 1000), b capped (200*3 <= 900), leftover 700
    // over c,d: 350 each
    val r = alloc(1000L, 1L, "a" -> 100L, "b" -> 200L,
      "c" -> 1000L, "d" -> 1000L)
    assert(r("a") == ((100L, 1L, 100L)))
    assert(r("b") == ((200L, 1L, 200L)))
    assert(r("c") == ((1000L, 0L, 350L)))
    assert(r("d") == ((1000L, 0L, 350L)))
    assert(r.values.map(_._3).sum == 1000L)
  }

  test("no quota ever exceeds its cap; the remainder goes by source order") {
    // leftover 1000 over 3 uncapped: 333 each + 1 to the first by name
    val r = alloc(1000L, 2L, "x" -> 900L, "y" -> 900L, "z" -> 900L)
    assert(r.values.forall { case (cap, _, q) => q <= cap })
    assert(r("x")._3 == 334L && r("y")._3 == 333L && r("z")._3 == 333L)
  }

  test("budget above total caps: everything capped, total honestly short") {
    val r = alloc(10000L, 2L, "a" -> 100L, "b" -> 300L)
    assert(r("a") == ((200L, 1L, 200L)))
    assert(r("b") == ((600L, 1L, 600L)))
    assert(r.values.map(_._3).sum == 800L)
  }

  test("epoch cap binds: maxEpochs scales the cap, not the mass") {
    val one = alloc(600L, 1L, "a" -> 100L, "b" -> 800L)
    val four = alloc(600L, 4L, "a" -> 100L, "b" -> 800L)
    assert(one("a")._3 == 100L) // capped at 1 epoch
    assert(four("a")._3 == 300L) // 4-epoch cap no longer binds at level 300
    assert(one.values.map(_._3).sum == 600L)
    assert(four.values.map(_._3).sum == 600L)
  }

  test("allocation is partition-invariant") {
    import spark.implicits._
    val rows = (1 to 40).map(i => (s"s$i", (i * 37 % 11 + 1) * 50L))
    val a = Packing.unimaxAllocate(rows.toDF("source", "n_tokens")
        .repartition(1), "source", "n_tokens", 5000L, 2L)
      .orderBy("source").collect().map(_.toSeq)
    val b = Packing.unimaxAllocate(rows.toDF("source", "n_tokens")
        .repartition(7), "source", "n_tokens", 5000L, 2L)
      .orderBy("source").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
