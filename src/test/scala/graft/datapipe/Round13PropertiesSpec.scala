package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestSession

/** ScalaCheck properties for the round-13 operators: token-index
  * batch-invariance (the incremental corpus-card guarantee), pruned-LM
  * closure under arbitrary bounds, and DSIR model/batch agreement on
  * arbitrary (including disjoint) corpora. Spark-backed cases run a
  * reduced sample count; the invariants are exact, not statistical. */
class Round13PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Seeded sampler (PropertiesSpec pattern — scalatestplus isn't in
    * the offline cache). */
  def forAll[A](g: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(1337L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val word: Gen[String] = Gen.choose(1, 4).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'e')).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))
  /** Up to 12 docs with distinct pseudo-random ids and small texts. */
  private val corpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    ids <- Gen.pick(n, 1L to 40L)
    texts <- Gen.listOfN(n, text)
  } yield ids.toSeq.zip(texts)

  test("property: token index is batch-invariant (merge ≡ one-shot)") {
    import spark.implicits._
    val gen = for {
      c <- corpus
      cut <- Gen.choose(0, c.size)
    } yield (c, cut)
    forAll(gen, n = 8) { case (c, cut) =>
      val (b1, b2) = c.splitAt(cut)
      val full = CorpusStats.tokenIndex(c.toDF("doc_id", "text"))
        .orderBy("token").collect().map(_.toSeq).toSeq
      val ix1 = CorpusStats.tokenIndex(
        (if (b1.isEmpty) Seq.empty[(Long, String)] else b1)
          .toDF("doc_id", "text"))
      val merged = CorpusStats.tokenIndexMerge(ix1, b2.toDF("doc_id", "text"))
        .orderBy("token").collect().map(_.toSeq).toSeq
      assert(merged == full, s"corpus=$c cut=$cut")
    }
  }

  test("property: pruned LM closure + covered-gram equality for arbitrary bounds") {
    import spark.implicits._
    val gen = for {
      c <- corpus
      minCount <- Gen.choose(1L, 3L)
      topK <- Gen.choose(1, 3)
    } yield (c, minCount, topK)
    forAll(gen, n = 8) { case (c, minCount, topK) =>
      val ref = c.toDF("doc_id", "text")
      val (f3, f2, f1, fn) = QualityScore.backoffLmModelCollected(ref)
      val (p3, p2, p1, pn) = QualityScore.backoffLmModelPruned(ref,
        minCount = minCount, topK = topK)
      assert(pn == fn)
      def prefix(g: String, w: Int) = g.split(' ').take(w).mkString(" ")
      // closure: conditioning contexts of kept grams are kept
      assert(p3.keys.forall(g => p2.contains(prefix(g, 2))), c.toString)
      assert(p2.keys.forall(g => p1.contains(prefix(g, 1))), c.toString)
      // bounds: cutoff + per-prefix cap, counts unpruned
      for ((m, fm) <- Seq(p3 -> f3, p2 -> f2, p1 -> f1); (g, cnt) <- m)
        assert(cnt == fm(g) && cnt >= minCount, s"$g in $c")
      assert(p3.keys.groupBy(prefix(_, 2)).values.forall(_.size <= topK))
      assert(p2.keys.groupBy(prefix(_, 1)).values.forall(_.size <= topK))
      // covered trigrams score identically at the hit3 tier
      for (g <- p3.keys)
        assert(QualityScore.backoffLmRow(g, p3, p2, p1, pn) ==
          QualityScore.backoffLmRow(g, f3, f2, f1, fn), s"$g in $c")
    }
  }

  test("property: DSIR batch weights equal the collected-model replay, any corpora") {
    import spark.implicits._
    val gen = for { raw <- corpus; tgt <- corpus } yield (raw, tgt)
    forAll(gen, n = 6) { case (raw, tgt) =>
      val B = 64
      val rawDf = raw.toDF("doc_id", "text")
      val tgtDf = tgt.toDF("doc_id", "text")
      val batch = Importance.importanceWeights(rawDf, tgtDf, buckets = B)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val (model, norm) =
        Importance.importanceModelCollected(rawDf, tgtDf, buckets = B)
      val viaModel = raw.map { case (id, t) =>
        id -> Importance.scoreRow(t, model, norm, B)._2
      }.toMap
      assert(batch == viaModel, s"raw=$raw tgt=$tgt")
    }
  }
}
