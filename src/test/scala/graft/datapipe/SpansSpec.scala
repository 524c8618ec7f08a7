package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SpansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  def run(df: org.apache.spark.sql.DataFrame, n: Int) =
    Spans.dupSpanMetrics(df, "id", "text", n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("cross-document shared span is counted dup on both sides") {
    // docs 1 and 2 share the 3-token span "b c d"; doc 3 is disjoint
    val df = docs(
      (1L, "a b c d"),
      (2L, "b c d e"),
      (3L, "x y z w"))
    val got = run(df, 3)
    // doc 1 spans: "a b c", "b c d"(dup); doc 2: "b c d"(dup), "c d e"
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((2L, 0L)))
  }

  test("within-document repeats count as dups") {
    val df = docs((1L, "p q p q p q"))
    // 2-token spans: pq qp pq qp pq → "p q"×3, "q p"×2 — all 5 dup
    assert(run(df, 2)(1L) == ((5L, 5L)))
  }

  test("documents shorter than n have zero spans but stay in the output") {
    val df = docs((1L, "one two"), (2L, "a b c d e"), (3L, "   "))
    val got = run(df, 4)
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((2L, 0L)))
    assert(got(3L) == ((0L, 0L)))
    assert(got.size == 3)
  }

  test("source overlap counts DISTINCT shared shingles once per pair") {
    import spark.implicits._
    // srcA and srcB share "a b c" (srcA has it in two docs — distinct
    // per source, so it counts ONCE); srcC shares nothing
    val df = Seq(
      ("A", "a b c x"), ("A", "a b c y"),
      ("B", "z a b c"), ("C", "p q r s")).toDF("src", "text")
    val got = Spans.sourceOverlapMatrix(df, "src", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 1L))
  }

  test("source overlap pair order is canonical (src_a < src_b)") {
    import spark.implicits._
    val df = Seq(("zz", "a b c"), ("aa", "a b c")).toDF("src", "text")
    val got = Spans.sourceOverlapMatrix(df, "src", "text", 3).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "aa" && got.head.getString(1) == "zz")
  }

  test("case folding and whitespace runs do not split spans") {
    val df = docs((1L, "A  b\tC d"), (2L, "a b c d"))
    val got = run(df, 4)
    assert(got(1L) == ((1L, 1L)) && got(2L) == ((1L, 1L)))
  }

  def runRemoval(df: org.apache.spark.sql.DataFrame, n: Int) =
    Spans.removeDuplicateSpans(df, "id", "text", n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("removal keeps the corpus-wide first occurrence, drops the rest") {
    // "b c d" occurs at (doc1, off2) and (doc2, off1); keeper is doc1
    val df = docs((1L, "a b c d"), (2L, "b c d e"), (3L, "x y z w"))
    val got = runRemoval(df, 3)
    assert(got(1L) == ((4L, 4L, "a b c d")))
    assert(got(2L) == ((4L, 1L, "e")))
    assert(got(3L) == ((4L, 4L, "x y z w")))
  }

  test("intra-document repeats after the first are removed") {
    // spans(n=2): "p q"@1,3,5 and "q p"@2,4 — keepers @1 and @2, so
    // removable occurrences cover positions {3,4,5,6} (overlapping)
    val df = docs((1L, "p q p q p q"))
    assert(runRemoval(df, 2)(1L) == ((6L, 2L, "p q")))
  }

  test("overlapping duplicated spans union their covered positions") {
    // doc2 shares abc/bcd/cde with doc1 (all kept in doc1); the three
    // overlapping removable occurrences in doc2 cover positions 1-5
    val df = docs((1L, "a b c d e"), (2L, "a b c d e x"))
    val got = runRemoval(df, 3)
    assert(got(1L) == ((5L, 5L, "a b c d e")))
    assert(got(2L) == ((6L, 1L, "x")))
  }

  test("a fully-duplicated document empties out; keeper doc survives") {
    val df = docs((1L, "a b c"), (2L, "a b c"))
    val got = runRemoval(df, 3)
    assert(got(1L) == ((3L, 3L, "a b c")))
    assert(got(2L) == ((3L, 0L, "")))
  }

  test("documents shorter than n pass through in normalized token space") {
    val df = docs((1L, "One  Two"), (2L, ""))
    val got = runRemoval(df, 3)
    assert(got(1L) == ((2L, 2L, "one two")))
    assert(got(2L) == ((0L, 0L, "")))
  }
}
