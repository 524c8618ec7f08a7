package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Sessionize vs a brute-force single-threaded pass: session boundaries
  * at gap > threshold, per-user isolation, tie-broken ordering, and
  * session stats. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // (user, epochSec, eventId) — user 1 has three sessions (gaps 3600s),
  // user 2 one session incl. an exact-gap edge (1800 is NOT a new
  // session: predicate is strictly-greater), user 3 a single event.
  val rows: Seq[(Long, Long, Long)] = Seq(
    (1L, 1000L, 1L), (1L, 1100L, 2L), (1L, 4800L, 3L), (1L, 4900L, 4L),
    (1L, 9000L, 5L),
    (2L, 500L, 6L), (2L, 2300L, 7L), (2L, 2301L, 8L),
    (3L, 42L, 9L))

  def brute(gap: Long): Map[Long, Long] = {
    rows.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var sess = 0L
      var prev = Option.empty[Long]
      sorted.map { case (_, ts, id) =>
        if (prev.forall(p => ts - p > gap)) sess += 1
        prev = Some(ts)
        id -> sess
      }
    }
  }

  test("session ids match brute force (gap edge is strict)") {
    import spark.implicits._
    val df = rows.toDF("user_id", "epoch", "event_id")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = Sessionize.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == brute(1800L))
  }

  test("session stats: counts and whole-second durations") {
    import spark.implicits._
    val df = rows.toDF("user_id", "epoch", "event_id")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val stats = Sessionize.sessionStats(df, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_id", "n_events", "first_event_id", "duration_sec")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(stats == Set(
      (1L, 1L, 2L, 1L, 100L), (1L, 2L, 2L, 3L, 100L), (1L, 3L, 1L, 5L, 0L),
      (2L, 1L, 3L, 6L, 1801L),
      (3L, 1L, 1L, 9L, 0L)))
  }

  test("one shuffle: single exchange on the user key") {
    import spark.implicits._
    val df = rows.toDF("user_id", "epoch", "event_id")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val plan = Sessionize.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
