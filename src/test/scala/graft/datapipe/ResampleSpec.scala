package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class ResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("grid covers the span, gaps are explicit zeros, ffill carries the last observation") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:15:00"), 1.0, 100L),
      (1L, ts("2024-01-01 10:45:00"), 2.0, 101L), // same bucket, later -> wins
      // 11:00 and 12:00 empty
      (1L, ts("2024-01-01 13:05:00"), 7.0, 102L),
      (2L, ts("2024-01-01 00:30:00"), 9.0, 200L),
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Resample.resampleFfill(events, "user_id", "ts", "value", "event_id")
      .orderBy("user_id", "bucket_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", 2L, 2.0), // last obs in bucket = 10:45 event
      (1L, "2024-01-01 11:00:00.0", 0L, 2.0), // gap: zero events, value carried
      (1L, "2024-01-01 12:00:00.0", 0L, 2.0),
      (1L, "2024-01-01 13:00:00.0", 1L, 7.0),
      (2L, "2024-01-01 00:00:00.0", 1L, 9.0)), got.toSeq)
  }

  test("non-default step yields a step-aligned grid (15 minutes)") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:07:00"), 1.0, 100L),
      (1L, ts("2024-01-01 10:18:00"), 2.0, 101L),
      // 10:30 and 10:45 empty
      (1L, ts("2024-01-01 11:01:00"), 7.0, 102L),
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Resample.resampleFfill(events, "user_id", "ts", "value",
        "event_id", step = "15 minutes")
      .orderBy("user_id", "bucket_ts")
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 10:00:00.0", 1L, 1.0),
      ("2024-01-01 10:15:00.0", 1L, 2.0),
      ("2024-01-01 10:30:00.0", 0L, 2.0),
      ("2024-01-01 10:45:00.0", 0L, 2.0),
      ("2024-01-01 11:00:00.0", 1L, 7.0)), got.toSeq)
  }

  test("daily step truncates to midnight; bad step strings are rejected") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:07:00"), 1.0, 100L),
      (1L, ts("2024-01-03 23:59:59"), 2.0, 101L),
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Resample.resampleFfill(events, "user_id", "ts", "value",
        "event_id", step = "1 day")
      .orderBy("bucket_ts")
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 1L),
      ("2024-01-02 00:00:00.0", 0L),
      ("2024-01-03 00:00:00.0", 1L)), got.toSeq)
    intercept[IllegalArgumentException] {
      Resample.resampleFfill(events, "user_id", "ts", "value",
        "event_id", step = "3 months")
    }
  }

  test("equal timestamps break ties deterministically by the tie column") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0, 2L),
      (1L, ts("2024-01-01 10:00:00"), 3.0, 9L), // higher tie id wins
    ).toDF("user_id", "ts", "value", "event_id")
    val v = Resample.resampleFfill(events, "user_id", "ts", "value", "event_id")
      .head().getDouble(3)
    assert(v == 3.0)
  }
}
