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

  /** Driver replay of [[Embeddings.MomentsAgg]] over a vector list —
    * the reference implementation for the power-iteration properties
    * (no Spark round-trip per generated case). */
  private def momentsOf(vs: Seq[Seq[Float]], d: Int): Array[Long] = {
    val len = 2 + d + d * (d + 1) / 2
    val buf = new Array[Long](len)
    vs.foreach { v =>
      val f = Array.tabulate(d)(i => math.round(v(i).toDouble * Embeddings.Fp))
      buf(0) += 1L
      var i = 0
      var o = 1 + d
      while (i < d) {
        buf(1 + i) += f(i)
        if (math.abs(f(i)) > buf(len - 1)) buf(len - 1) = math.abs(f(i))
        var j = i
        while (j < d) { buf(o) += f(i) * f(j); o += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  private val smallVec: Gen[Seq[Float]] = Gen.choose(0, 3).flatMap(_ =>
    Gen.listOfN(4, Gen.choose(-1000, 1000).map(_.toFloat / 700f)))

  test("property: power iteration — PSD eigenvalue bounds and normalization invariants") {
    val gen = for {
      n <- Gen.choose(2, 20)
      vs <- Gen.listOfN(n, smallVec)
      iters <- Gen.choose(1, 24)
    } yield (vs, iters)
    forAll(gen, n = 40) { case (vs, iters) =>
      val d = 4
      val m = momentsOf(vs, d)
      val (v, lam) = Embeddings.powerIterationFixed(m, d, iters)
      // PSD: the floor'd Rayleigh quotient can never be negative
      assert(lam.signum >= 0, s"lam=$lam vs=$vs")
      // eigenvalue <= trace: lam * n^2 <= sum of A's diagonal
      val n = BigInt(m(0))
      val s = Array.tabulate(d)(i => BigInt(m(1 + i)))
      var o = 1 + d
      var trace = BigInt(0)
      for (i <- 0 until d; j <- i until d) {
        if (i == j) trace += n * BigInt(m(o)) - s(i) * s(j)
        o += 1
      }
      assert(lam * n * n <= trace, s"lam=$lam trace=$trace n=$n")
      // normalization: components bounded by 2^20, and unless the
      // covariance is identically zero the max |component| IS 2^20
      val fp = BigInt(Embeddings.Fp)
      assert(v.forall(_.abs <= fp))
      if (v.exists(_.signum != 0)) assert(v.map(_.abs).max == fp)
      // pure function: same buffer, same result
      val (v2, lam2) = Embeddings.powerIterationFixed(m, d, iters)
      assert(v.sameElements(v2) && lam == lam2)
    }
  }

  test("property: moment buffers merge associatively across any batch split") {
    val gen = for {
      n <- Gen.choose(2, 16)
      vs <- Gen.listOfN(n, smallVec)
      cut <- Gen.choose(0, n)
    } yield (vs, cut)
    forAll(gen, n = 25) { case (vs, cut) =>
      val d = 4
      val (b1, b2) = vs.splitAt(cut)
      val one = momentsOf(vs, d)
      val (m1, m2) = (momentsOf(b1, d), momentsOf(b2, d))
      // MomentsAgg.merge semantics: sums add, trailing max-slot maxes
      val merged = Array.tabulate(one.length)(i =>
        if (i == one.length - 1) math.max(m1(i), m2(i)) else m1(i) + m2(i))
      assert(merged.sameElements(one), s"cut=$cut")
    }
  }

  test("property: ivfProbe with every cell probed is integer-L2 brute force") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(6, 30)
      vs <- Gen.listOfN(n, smallVec)
      k <- Gen.choose(2, 4)
      topK <- Gen.choose(1, 4)
    } yield (vs, k, topK)
    forAll(gen, n = 6) { case (vs, k, topK) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("vec_id", "embedding")
      val centroids = Clustering.kmeansCentroids(df, k = k, iters = 2)
      val idx = Clustering.ivfIndex(df, centroids)
      def quant(v: Seq[Float]): Array[Long] =
        v.map(x => math.floor(x.toDouble * Clustering.Fp).toLong).toArray
      val qs = rows.take(2).map { case (id, v) => id -> quant(v) }
      val got = Clustering.ivfProbe(idx, centroids, qs, nProbe = k, k = topK)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val all = rows.map { case (id, v) => id -> quant(v) }
      val brute = qs.flatMap { case (qid, qv) =>
        all.filter(_._1 != qid).map { case (id, v) =>
          ((0 until qv.length).map(i => (qv(i) - v(i)) * (qv(i) - v(i))).sum, id)
        }.sorted.take(topK).zipWithIndex.map { case ((s, id), r) =>
          (qid, (r + 1).toLong, id, s)
        }
      }
      assert(got.toSeq.sorted == brute.sorted, s"k=$k topK=$topK")
    }
  }

  test("property: audio frame features are frame-local at any frame length") {
    // per-frame features recomputed from the synthesis arithmetic
    // must match the real-decode path for arbitrary frame lengths
    import spark.implicits._
    val gen = for {
      ids <- Gen.pick(2, 0L to 50L)
      fl <- Gen.choose(2, 200)
    } yield (ids.toSeq, fl)
    forAll(gen, n = 5) { case (ids, fl) =>
      val media = Multimodal.synthWavTable(spark, ids.toDF("doc_id"))
      val got = Multimodal.audioFrameFeatures(spark, media, frameLen = fl)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
      for (id <- ids) {
        val n = (200 + id % 100).toInt
        val s = Array.tabulate(n)(i => (((id * 7 + i * 37) % 65536) - 32768).toInt)
        for (st <- 0 until n by fl) {
          val en = math.min(st + fl, n)
          val fr = s.slice(st, en)
          val zc = (st + 1 until en)
            .count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
          assert(got((id, (st / fl).toLong)) ==
            ((en - st).toLong, fr.map(_.toLong).sum, fr.min.toLong,
              fr.max.toLong, zc), s"id=$id fl=$fl st=$st")
        }
      }
    }
  }
}
