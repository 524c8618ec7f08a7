package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[QualityScore.backoffLmScore]] — exact stupid-backoff trigram LM. */
class BackoffLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val Fp = 1L << 20

  private def score(ref: Seq[(Long, String)], docs: Seq[(Long, String)]) = {
    import spark.implicits._
    QualityScore.backoffLmScore(docs.toDF("doc_id", "text"),
        ref.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("the four tiers fire with the published exact values") {
    // ref: "a b c a b d" → c3: {abc:1, bca:1, cab:1, abd:1}
    //      c2: {ab:2, bc:1, ca:1, bd:1}; c1: {a:2,b:2,c:1,d:1}; N=6
    val ref = Seq(1L -> "a b c a b d")
    // doc trigrams: "a b c" hit3: 1·fp/c2(ab)=fp/2
    //               "b c x": g2s "c x" miss, w3 "x" miss → OOV 0
    //               "c x d": miss, g2s "x d" miss, w3 "d" hit1: 4·1·fp/(25·6)
    //               "x d a": g2s "d a" miss, w3 "a": 4·2·fp/(25·6)
    val r = score(ref, Seq(10L -> "a b c x d a"))(10L)
    assert(r.getAs[Long]("n_trigrams") == 4L)
    assert(r.getAs[Long]("n_hit3") == 1L)
    assert(r.getAs[Long]("n_bo2") == 0L)
    assert(r.getAs[Long]("n_bo1") == 2L)
    assert(r.getAs[Long]("n_oov") == 1L)
    assert(r.getAs[Long]("sum_s_fp") ==
      Fp / 2 + 0 + 4 * Fp / 150 + 8 * Fp / 150)
    assert(r.getAs[Long]("min_s_fp") == 0L)
    // bigram tier: doc "c a b" scores c3(cab)=1 hit... use "b d c":
    // c3 miss("b d c"), g2s "d c" miss, w3 "c" → bo1. For a bo2 case:
    // "x b c": c3 miss, g2s "b c" hit → 2·1·fp/(5·c1(b)=2)
    val s = score(ref, Seq(11L -> "x b c"))(11L)
    assert(s.getAs[Long]("n_bo2") == 1L)
    assert(s.getAs[Long]("sum_s_fp") == 2 * Fp / 10)
  }

  test("self-scoring never backs off") {
    val corpus = Seq(1L -> "the quick fox jumps", 2L -> "the quick dog runs")
    val r = score(corpus, corpus)
    assert(r.values.forall(x => x.getAs[Long]("n_bo2") == 0L &&
      x.getAs[Long]("n_bo1") == 0L && x.getAs[Long]("n_oov") == 0L))
    assert(r(1L).getAs[Long]("n_hit3") == 2L)
  }

  test("short and null documents emit zeroed rows") {
    val ref = Seq(1L -> "a b c d")
    val r = score(ref, Seq(2L -> "a b", 3L -> "", 4L -> null.asInstanceOf[String]))
    for (id <- Seq(2L, 3L, 4L))
      assert(r(id).getAs[Long]("n_trigrams") == 0L &&
        r(id).getAs[Long]("sum_s_fp") == 0L)
  }

  test("driver replay equality on mixed-tier corpora, partition invariant") {
    val ref = (1L to 20L).map(i => i -> s"w${i % 6} w${i % 4} w${i % 3} w${i % 5}")
    val docs = (1L to 30L).map(i => i -> s"w${i % 7} w${i % 4} w${i % 3} q${i % 9}")
    import spark.implicits._
    val (c3, c2, c1, n) = QualityScore.backoffLmModelCollected(
      ref.toDF("doc_id", "text"))
    val want = docs.map { case (id, t) =>
      id -> QualityScore.backoffLmRow(t, c3, c2, c1, n)
    }.toMap
    for (parts <- Seq(1, 5)) {
      val got = QualityScore.backoffLmScore(
          docs.toDF("doc_id", "text").repartition(parts),
          ref.toDF("doc_id", "text").repartition(3))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
      assert(got == want, s"parts=$parts")
    }
  }
}
