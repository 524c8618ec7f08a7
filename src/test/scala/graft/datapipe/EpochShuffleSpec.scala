package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Sampling.epochShuffle]] — deterministic sharded permutation. */
class EpochShuffleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df(n: Long) = {
    import spark.implicits._
    (1L to n).map(i => (i, s"doc$i")).toDF("doc_id", "text")
  }

  test("positions are a 1..n permutation within every shard") {
    val out = Sampling.epochShuffle(df(200), "doc_id", 4, "ep0")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val byShard = out.groupBy(_._1)
    assert(byShard.keys.forall(s => s >= 0 && s < 4))
    for ((_, rows) <- byShard)
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    assert(out.length == 200)
  }

  test("order equals driver-side md5 replay and is partition-invariant") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    val ids = (1L to 100L)
    val want = ids.map { i =>
      val key = md5hex(i.toString + "ep1").substring(0, 8)
      (i, key, java.lang.Long.parseLong(key, 16) % 3)
    }.groupBy(_._3).flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case ((id, _, _), k) => id -> ((shard, k + 1L)) }
    }
    for (parts <- Seq(1, 7)) {
      val got = Sampling.epochShuffle(df(100).repartition(parts),
          "doc_id", 3, "ep1")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("a different epoch salt yields a different permutation") {
    def order(salt: String) =
      Sampling.epochShuffle(df(100), "doc_id", 1, salt)
        .orderBy("pos").collect().map(_.getLong(0)).toSeq
    assert(order("ep0") != order("ep1"))
    assert(order("ep0").sorted == order("ep1").sorted)
  }
}
