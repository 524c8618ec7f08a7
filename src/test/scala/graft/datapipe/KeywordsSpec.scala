package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class KeywordsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  def run(df: org.apache.spark.sql.DataFrame, k: Int,
          stop: Set[String] = Set.empty) =
    Keywords.topKeywords(df, "id", "text", k, stop)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))

  test("ranks by tf desc, then rarity (df asc), then term") {
    // "alpha" tf=3 in doc 1; "beta" tf=2; corpus df: alpha in 2 docs,
    // beta in 1, gamma in 2
    val df = docs(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "alpha gamma"))
    val got = run(df, 2)
    assert(got.filter(_._1 == 1L).map(t => (t._3, t._4, t._5)).toSeq ==
      Seq(("alpha", 3L, 2L), ("beta", 2L, 1L)))
    // doc 2: alpha and gamma both tf=1 df=2 → term asc breaks the tie
    assert(got.filter(_._1 == 2L).map(_._3).toSeq == Seq("alpha", "gamma"))
  }

  test("df tiebreak prefers the rarer term at equal tf") {
    val df = docs(
      (1L, "rare common"),
      (2L, "common"),
      (3L, "common"))
    val got = run(df, 1)
    // doc 1: rare (df=1) beats common (df=3) at tf=1
    assert(got.filter(_._1 == 1L).map(_._3).toSeq == Seq("rare"))
  }

  test("stopwords and empties are removed before counting") {
    val df = docs((1L, "the the the signal   signal the"))
    val got = run(df, 5, stop = Set("the"))
    assert(got.map(_._3).toSeq == Seq("signal"))
    assert(got.head._4 == 2L) // tf counts only surviving tokens
  }

  test("tokenization is case-folded and whitespace-split (Tok.WS)") {
    val df = docs((1L, "Word word\tWORD\nother"))
    val got = run(df, 5)
    assert(got.map(t => (t._3, t._4)).toSeq ==
      Seq(("word", 3L), ("other", 1L)))
  }

  test("k caps per-document output; fewer terms yield fewer rows") {
    val df = docs((1L, "a b c d e"), (2L, "x"))
    val got = run(df, 3)
    assert(got.count(_._1 == 1L) == 3)
    assert(got.count(_._1 == 2L) == 1)
  }
}
