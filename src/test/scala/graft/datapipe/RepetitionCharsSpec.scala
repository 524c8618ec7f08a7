package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** [[QualityScore.repetitionCharMetrics]] — the character-fraction
  * Gopher repetition rules. Crafted documents pin the normalized char
  * space, the deterministic top-gram pick, and the overlap-MERGED
  * duplicated-gram coverage (the property the grams-counting q76
  * metrics cannot express).
  */
class RepetitionCharsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def metrics(nTop: Int, nDup: Int, texts: (Long, String)*) = {
    import spark.implicits._
    QualityScore.repetitionCharMetrics(texts.toDF("doc_id", "text"),
        nTop = nTop, nDup = nDup)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("n_chars is the single-space-normalized length") {
    // raw text has a tab run and trailing blank; normalized = "a bb ccc"
    val r = metrics(2, 5, 1L -> "a \t bb   ccc ")(1L)
    assert(r.getAs[Long]("n_chars") == 8L)
  }

  test("top-gram chars = count × joined gram length, smallest gram on ties") {
    // bigrams: "x y" ×2, "y x" ×1, "y z" ×1, "z x" ×1... tokens:
    // x y x y z  → "x y"×2 "y x"×1 "y z"×1; top = "x y" (count 2, len 3)
    val r = metrics(2, 5, 1L -> "x y x y z")(1L)
    assert(r.getAs[Long]("top2_count") == 2L)
    assert(r.getAs[Long]("top2_chars") == 6L)
    // all bigrams distinct → every count 1; tie broken to the
    // lexicographically smallest bigram ("a b", len 3)
    val t = metrics(2, 5, 2L -> "c a b d")(2L)
    assert(t.getAs[Long]("top2_count") == 1L)
    assert(t.getAs[Long]("top2_chars") == 3L)
  }

  test("duplicated-gram coverage merges overlapping occurrences") {
    // tokens: (a b c d e) ×3 — every 5-gram recurs 5 positions later,
    // so the merged duplicated spans cover the whole 29-char
    // normalized text once merged (not sum-of-span-lengths)
    val r = metrics(2, 5, 1L -> "a b c d e a b c d e a b c d e")(1L)
    assert(r.getAs[Long]("n_chars") == 29L)
    assert(r.getAs[Long]("dup5_chars") == 29L)
  }

  test("disjoint duplicated occurrences sum without double counting") {
    // tokens: a b c d e v w x y a b c d e — only "a b c d e" recurs,
    // covering chars [0,8] and [18,26]: 18 of the 27 normalized chars
    val r = metrics(2, 5, 1L -> "a b c d e v w x y a b c d e")(1L)
    assert(r.getAs[Long]("n_chars") == 27L)
    assert(r.getAs[Long]("dup5_chars") == 18L)
  }

  test("gram sizes outside the published Gopher table are rejected") {
    intercept[IllegalArgumentException] { QualityScore.gopherTopPct(5) }
    intercept[IllegalArgumentException] { QualityScore.gopherDupPct(2) }
    // covered sizes resolve to the size-specific published threshold
    assert(QualityScore.gopherTopPct(3) == 18)
    assert(QualityScore.gopherDupPct(6) == 14)
  }

  test("documents shorter than the gram sizes emit zeros and keep") {
    val r = metrics(2, 5, 1L -> "solo", 2L -> "", 3L -> null.asInstanceOf[String])
    for (id <- Seq(1L, 2L, 3L)) {
      assert(r(id).getAs[Long]("top2_chars") == 0L)
      assert(r(id).getAs[Long]("dup5_chars") == 0L)
      assert(r(id).getAs[Long]("keep_rep") == 1L)
    }
    assert(r(1L).getAs[Long]("n_chars") == 4L)
    assert(r(2L).getAs[Long]("n_chars") == 0L)
  }

  test("keep flag applies both published thresholds") {
    // 60 distinct-ish words → no repetition → keep
    val clean = (1 to 60).map(i => s"w$i").mkString(" ")
    // the same 5-gram repeated 12 times → dup-5 coverage = 100% > 15%
    val spam = Seq.fill(12)("lorem ipsum dolor sit amet").mkString(" ")
    val r = metrics(2, 5, 1L -> clean, 2L -> spam)
    assert(r(1L).getAs[Long]("keep_rep") == 1L)
    assert(r(2L).getAs[Long]("keep_rep") == 0L)
    assert(r(2L).getAs[Long]("dup5_chars") == r(2L).getAs[Long]("n_chars"))
  }

  test("metrics are partition-invariant") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      i -> Seq.fill(5)(s"tok${i % 7} rep rep tok${i % 3}").mkString(" "))
    val a = QualityScore.repetitionCharMetrics(
      docs.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = QualityScore.repetitionCharMetrics(
      docs.toDF("doc_id", "text").repartition(7))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
