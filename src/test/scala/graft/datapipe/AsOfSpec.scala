package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** AsOf.asofJoin vs a brute-force per-row scan, including equal-ts
  * ties (inclusive vs strict) and keys with no right rows. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // (key, ts, tie, value)
  val rightRows: Seq[(Long, Long, Long, String)] = Seq(
    (1L, 10L, 100L, "r10"), (1L, 20L, 101L, "r20"), (1L, 20L, 102L, "r20b"),
    (2L, 5L, 103L, "r5"), (3L, 50L, 104L, "r50"))
  // (key, ts, tie)
  val leftRows: Seq[(Long, Long, Long)] = Seq(
    (1L, 9L, 1L), (1L, 10L, 2L), (1L, 20L, 3L), (1L, 25L, 4L),
    (2L, 4L, 5L), (2L, 6L, 6L), (3L, 50L, 7L), (4L, 99L, 8L))

  def brute(strict: Boolean): Map[Long, Option[String]] =
    leftRows.map { case (k, ts, tie) =>
      val cands = rightRows.filter { case (rk, rts, _, _) =>
        rk == k && (if (strict) rts < ts else rts <= ts)
      }
      // latest by (ts, tie): the operator's deterministic winner
      tie -> cands.sortBy(c => (c._2, c._3)).lastOption.map(_._4)
    }.toMap

  def run(strict: Boolean): Map[Long, Option[String]] = {
    import spark.implicits._
    val left = leftRows.toDF("k", "ts", "tie")
    val right = rightRows.toDF("k", "ts", "tie", "v")
    AsOf.asofJoin(left, right, "k", "ts", "tie", Seq("v"), strict)
      .collect()
      .map(r => r.getAs[Long]("tie") ->
        Option(r.getAs[String]("asof_v")))
      .toMap
  }

  test("inclusive as-of equals brute force (right rows at equal ts visible)") {
    assert(run(strict = false) == brute(strict = false))
  }

  test("strict as-of equals brute force (equal ts hidden)") {
    assert(run(strict = true) == brute(strict = true))
  }

  test("as-of on the events table matches the q37 window formulation") {
    import spark.implicits._
    val events = graft.util.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = events.filter(col("event_type") === "purchase")
    val clicks = events.filter(col("event_type") === "click")
    // Precondition: the equivalence needs no click/purchase (user, ts)
    // collisions — q37's [unbounded,-1] row frame would include an
    // equal-ts click with a smaller event_id, while strict as-of hides
    // every equal-ts click. Fail loudly if the generator ever changes.
    val collisions = purchases.select(col("user_id"), col("ts"))
      .intersect(clicks.select(col("user_id"), col("ts"))).count()
    assert(collisions == 0,
      s"testdata now has $collisions click/purchase (user, ts) ties; " +
        "strict as-of and the q37 row-frame window legitimately differ on ties")
    val viaOp = AsOf.asofJoin(
      purchases.select(col("event_id"), col("user_id"), col("ts")),
      clicks.select(col("event_id"), col("user_id"), col("ts")),
      "user_id", "ts", "event_id", Seq("event_id"), strict = true)
      .select(col("event_id"), col("asof_event_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val viaQuery = graft.queries.RelationalQueries
      .q37AsofPrevClick(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(viaOp == viaQuery)
  }
}
