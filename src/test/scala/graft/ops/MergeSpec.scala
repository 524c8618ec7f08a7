package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def base = Seq(
    (1L, "a", 1L, false),
    (2L, "b", 1L, false),
    (3L, "c", 1L, false),
  ).toDF("id", "val", "version", "is_deleted")

  test("upsert, tombstone, and insert apply; untouched rows survive") {
    val delta = Seq(
      (2L, "b2", 2L, false),  // update
      (3L, "c", 2L, true),    // delete
      (4L, "d", 1L, false),   // insert
    ).toDF("id", "val", "version", "is_deleted")
    val out = Merge.applyChanges(base, delta, Seq("id"), "version", "is_deleted")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("equal versions: delta wins (re-apply is idempotent)") {
    val delta = Seq((1L, "a'", 1L, false)).toDF("id", "val", "version", "is_deleted")
    val once = Merge.applyChanges(base, delta, Seq("id"), "version", "is_deleted")
    assert(once.filter($"id" === 1L).head().getString(1) == "a'")
    val twice = Merge.applyChanges(once, delta, Seq("id"), "version", "is_deleted")
    assert(twice.orderBy("id").collect().toSeq ==
      once.orderBy("id").collect().toSeq)
  }

  test("delete of an absent key is a no-op; null deleted flag = false") {
    val delta = Seq(
      (99L, "zz", 5L, true), // tombstone for a key not in base
    ).toDF("id", "val", "version", "is_deleted")
    val out = Merge.applyChanges(base, delta, Seq("id"), "version", "is_deleted")
    assert(out.count() == 3)
    // null is_deleted treated as false
    val nullDel = Seq((5L, "e", 1L, null.asInstanceOf[java.lang.Boolean]))
      .toDF("id", "val", "version", "is_deleted")
      .withColumn("is_deleted", col("is_deleted").cast("boolean"))
    val out2 = Merge.applyChanges(base, nullDel, Seq("id"), "version", "is_deleted")
    assert(out2.count() == 4)
  }

  test("duplicate same-version delta rows resolve deterministically") {
    val delta = Seq(
      (1L, "dup-x", 5L, false),
      (1L, "dup-y", 5L, false),
    ).toDF("id", "val", "version", "is_deleted")
    val picks = (1 to 5).map { _ =>
      Merge.applyChanges(base, delta.repartition(3), Seq("id"),
          "version", "is_deleted")
        .filter($"id" === 1L).head().getString(1)
    }.toSet
    assert(picks.size == 1, s"nondeterministic tie-break: $picks")
  }

  test("mismatched columns are rejected") {
    val bad = Seq((1L, 1L, false)).toDF("id", "version", "is_deleted")
    intercept[IllegalArgumentException] {
      Merge.applyChanges(base, bad, Seq("id"), "version", "is_deleted")
    }
  }
}
