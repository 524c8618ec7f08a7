package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** [[QualityScore.lmScore]] — corpus bigram LM fluency score in fixed
  * point. Values hand-computed: P(w2|w1) = c(bigram)/c(prefix) scaled
  * by 2^20 with integer floor division.
  */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val Fp = 1L << 20

  test("hand-computed MLE transition probabilities") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: "a b" x2, "b a" x1
      (2L, "a b c"),     // bigrams: "a b", "b c"
      (3L, "x"),         // no bigrams
      (4L, null: String),
    ).toDF("doc_id", "text")
    // corpus: c("a b")=3, c("b a")=1, c("b c")=1; prefixes: c(a·)=3, c(b·)=2
    // p("a b") = 3*Fp/3 = Fp; p("b a") = p("b c") = Fp/2
    val got = QualityScore.lmScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2 * Fp + Fp / 2, Fp / 2),
      (2L, 2L, Fp + Fp / 2, Fp / 2),
      (3L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L)))
  }

  test("case folding and whitespace runs normalize before counting") {
    import spark.implicits._
    val docs = Seq((1L, "The  cat"), (2L, "the CAT")).toDF("doc_id", "text")
    // both docs yield the single bigram "the cat": c=2, prefix c(the·)=2 -> p=Fp
    val got = QualityScore.lmScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, Fp, Fp), (1L, Fp, Fp)))
  }

  test("partitioning-invariant") {
    import spark.implicits._
    val docs = (1 to 200)
      .map(i => (i.toLong, (0 to i % 23).map(j => s"w${(i * 7 + j * 13) % 31}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = QualityScore.lmScore(docs.repartition(1)).orderBy("doc_id").collect().toSeq
    val b = QualityScore.lmScore(docs.repartition(17)).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("probabilities per prefix sum to ~Fp (floor loss < #distinct successors)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c a d b e")).toDF("doc_id", "text")
    // prefix a: successors b, c, d (cu=3, cb=1 each) -> p = Fp/3 each, floor
    val r = QualityScore.lmScore(docs).collect().head
    assert(r.getLong(1) == 7L)                       // 7 bigram occurrences
    assert(r.getLong(3) == Fp / 3)                   // weakest = 1/3 transitions
  }
}
