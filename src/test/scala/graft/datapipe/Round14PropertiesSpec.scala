package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestSession

/** ScalaCheck properties for the round-14 operators: spectral audio
  * features are frame-local at any frame length (the q142 oracle
  * convention), and the deflated power iteration is a pure function
  * of the moment buffer. Exact invariants, not statistical. */
class Round14PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Seeded sampler (PropertiesSpec pattern — scalatestplus isn't in
    * the offline cache). */
  def forAll[A](g: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(4242L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("property: spectral features are frame-local at any frame length") {
    // per-frame re/im/energy recomputed from the synthesis arithmetic
    // and the shared trig table must match the real-decode path for
    // arbitrary frame lengths — a frame's spectrum depends only on
    // its own samples at local phase
    import spark.implicits._
    val gen = for {
      ids <- Gen.pick(2, 0L to 50L)
      fl <- Gen.choose(2, 160)
    } yield (ids.toSeq, fl)
    val cosT = Multimodal.trigTable.map(_._2)
    val sinT = Multimodal.trigTable.map(_._3)
    forAll(gen, n = 5) { case (ids, fl) =>
      val media = Multimodal.synthWavTable(spark, ids.toDF("doc_id"))
      val got = Multimodal.audioSpectralFeatures(spark, media, frameLen = fl)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) ->
          (r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      for (id <- ids) {
        val n = (200 + id % 100).toInt
        val s = Array.tabulate(n)(i => (((id * 7 + i * 37) % 65536) - 32768).toInt)
        val expectKeys = for {
          st <- (0 until n by fl)
          k <- Multimodal.SpectralBins
        } yield (id, (st / fl).toLong, k)
        assert(got.keySet.filter(_._1 == id) == expectKeys.toSet)
        for (st <- 0 until n by fl; k <- Multimodal.SpectralBins) {
          val en = math.min(st + fl, n)
          var re = 0L
          var im = 0L
          for (i <- st until en) {
            val ph = (k * (i - st)) % Multimodal.SpectralPhases
            re += s(i) * cosT(ph)
            im += s(i) * sinT(ph)
          }
          val energy = ((BigInt(re) * re + BigInt(im) * im) /
            BigInt(Multimodal.SpectralFp)).toLong
          assert(got((id, (st / fl).toLong, k)) == ((re, im, energy)),
            s"id=$id fl=$fl st=$st k=$k")
        }
      }
    }
  }

  test("property: deflated solve is a pure function of the moments (partition-invariant)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = Gen.choose(40, 120)
    forAll(gen, n = 3) { nRows =>
      val d = 6
      val df = (1 to nRows).map { r =>
        (r.toLong, Seq.tabulate(d) { i =>
          ((((r * 2654435761L + i * 7919L) % 997).toFloat / 997f - 0.5f) *
            (if (i < 2) 1f else 0.2f))
        })
      }.toDF("id", "vec")
      def m(part: org.apache.spark.sql.DataFrame) = part
        .select(col("vec")).as[Seq[Float]]
        .select(new Embeddings.MomentsAgg(d).toColumn.name("m")).head()
        .map(BigInt(_))
      val (vA, lA) = Embeddings.deflatedPowerIterationFixed(m(df), d, 32)
      val (vB, lB) = Embeddings.deflatedPowerIterationFixed(
        m(df.repartition(7)), d, 32)
      assert(vA.sameElements(vB) && lA == lB)
      // and the deflated iterate is never the dominant one on a
      // non-degenerate corpus: it is orthogonal-ish to v1
      val (v1, _) = Embeddings.powerIterationFixed(m(df), d, 32)
      val dot = (0 until d).map(i => (vA(i) * v1(i)).toDouble).sum
      val na = math.sqrt((0 until d).map(i => (vA(i) * vA(i)).toDouble).sum)
      val nb = math.sqrt((0 until d).map(i => (v1(i) * v1(i)).toDouble).sum)
      if (na > 0 && nb > 0)
        assert(math.abs(dot / na / nb) < 0.05, s"cos=${dot / na / nb}")
    }
  }
}
