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

  private val PrunedRef = (1L to 40L).map(i =>
    i -> s"w${i % 6} w${i % 4} w${i % 3} w${i % 5} w${i % 2}")

  test("pruned model with no-op bounds equals the full model exactly") {
    import spark.implicits._
    val ref = PrunedRef.toDF("doc_id", "text")
    val full = QualityScore.backoffLmModelCollected(ref)
    val pruned = QualityScore.backoffLmModelPruned(ref,
      minCount = 1L, topK = 1000000)
    assert(pruned == full)
  }

  test("pruned model honors bounds, closure, and unpruned counts") {
    import spark.implicits._
    val ref = PrunedRef.toDF("doc_id", "text")
    val (f3, f2, f1, fn) = QualityScore.backoffLmModelCollected(ref)
    val minCount = 2L
    val topK = 2
    val (p3, p2, p1, pn) = QualityScore.backoffLmModelPruned(ref,
      minCount = minCount, topK = topK)
    // n is the FULL corpus mass even under pruning
    assert(pn == fn)
    // every kept gram keeps its unpruned count and clears the cutoff
    for ((m, fm) <- Seq(p3 -> f3, p2 -> f2, p1 -> f1); (g, c) <- m) {
      assert(c == fm(g), s"count changed for $g")
      assert(c >= minCount, s"cutoff violated for $g")
    }
    // per-prefix cap
    def prefix(g: String, words: Int) =
      g.split(' ').take(words).mkString(" ")
    assert(p2.keys.groupBy(prefix(_, 1)).values.forall(_.size <= topK))
    assert(p3.keys.groupBy(prefix(_, 2)).values.forall(_.size <= topK))
    // closure: denominators of every kept gram are themselves kept
    assert(p3.keys.forall(g => p2.contains(prefix(g, 2))), "c3 prefix miss")
    assert(p2.keys.forall(g => p1.contains(prefix(g, 1))), "c2 prefix miss")
    // and the pruning was non-trivial on this corpus
    assert(p3.size < f3.size && p2.size < f2.size)
  }

  test("pruned model scores equal the full model wherever it covers the gram") {
    import spark.implicits._
    val ref = PrunedRef.toDF("doc_id", "text")
    val (f3, f2, f1, fn) = QualityScore.backoffLmModelCollected(ref)
    val (p3, p2, p1, pn) = QualityScore.backoffLmModelPruned(ref,
      minCount = 2L, topK = 2)
    // every kept trigram resolves at the hit3 tier in both models with
    // a bit-identical score (single-trigram documents isolate the tier)
    for (g <- p3.keys) {
      val got = QualityScore.backoffLmRow(g, p3, p2, p1, pn)
      val want = QualityScore.backoffLmRow(g, f3, f2, f1, fn)
      assert(got == want, s"covered trigram $g diverged")
      assert(got._4 == 1L, s"$g should resolve at hit3")
    }
    // a PRUNED trigram degrades through the chain like an unseen one:
    // it must score strictly at a lower tier, never crash
    val dropped = f3.keySet -- p3.keySet
    assert(dropped.nonEmpty)
    for (g <- dropped) {
      val (cnt, _, _, h3, _, _, _) =
        QualityScore.backoffLmRow(g, p3, p2, p1, pn)
      assert(cnt == 1L && h3 == 0L, s"pruned trigram $g still hit3")
    }
  }

  test("batch pruned scorer: no-op bounds equal the full scorer, " +
      "aggressive bounds equal the collected-model twin") {
    import spark.implicits._
    val ref = PrunedRef.toDF("doc_id", "text")
    val docs = (100L to 140L)
      .map(i => i -> s"w${i % 6} w${i % 4} w${i % 3} w${i % 5} q$i")
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // no-op bounds: identical to the unpruned cross-split scorer
    assert(rows(QualityScore.backoffLmScorePruned(docs, ref,
        minCount = 1L, topK = 1000000)) ==
      rows(QualityScore.backoffLmScore(docs, ref)))
    // aggressive bounds: the distributed scorer IS the collected-model
    // twin (the streaming face scores with the same pruned maps)
    val (p3, p2, p1, pn) = QualityScore.backoffLmModelPruned(ref,
      minCount = 2L, topK = 2)
    val got = rows(QualityScore.backoffLmScorePruned(docs, ref,
      minCount = 2L, topK = 2))
    val want = docs.as[(Long, String)].collect().map { case (id, t) =>
      val r = QualityScore.backoffLmRow(t, p3, p2, p1, pn)
      id -> Seq(r._1, r._2, r._3, r._4, r._5, r._6, r._7)
    }.toMap
    assert(got == want)
    // and pruning actually changed some document's tier histogram
    val full = rows(QualityScore.backoffLmScore(docs, ref))
    assert(got != full)
  }
}
