package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.datapipe.Hashing

/** ScalaCheck properties for the span/hash algebra (SURVEY §5 plan):
  * nested-removal idempotence, offset consistency, abbreviation
  * constraints, hash determinism and bounds. */
class PropertiesSpec extends AnyFunSuite {

  /** Seeded sampler: scalatestplus isn't in the offline cache, so drive
    * ScalaCheck generators directly — deterministic across runs. */
  def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b))(t => f(t._1, t._2))

  val word: Gen[String] = Gen.choose(1, 10).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  val text: Gen[String] = Gen.choose(0, 60).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))
  val span: Gen[(Int, Int)] = for {
    s <- Gen.choose(0, 200)
    len <- Gen.choose(1, 30)
  } yield (s, s + len)

  def mkTag(s: Int, e: Int): MatchedTag =
    MatchedTag("m", s, e, "CAT", "DB", "ref", "orig", "label")

  test("property: removeNested is idempotent and output is non-nested") {
    forAll(Gen.listOf(span)) { spans =>
      val tags = spans.map { case (s, e) => mkTag(s, e) }
      val once = BioentityTagger.removeNested(tags)
      val twice = BioentityTagger.removeNested(once)
      assert(once.toSet == twice.toSet)
      // no surviving tag strictly contains another
      once.foreach { a =>
        once.foreach { b =>
          if (a != b)
            assert(!(a.start <= b.start && b.end <= a.end &&
              (a.start < b.start || a.end > b.end)))
        }
      }
    }
  }

  test("property: tokenizer offsets always index the source text") {
    forAll(Gen.asciiPrintableStr) { s =>
      BioTokenizer.tokenize(s).foreach { t =>
        assert(t.start >= 0 && t.end <= s.length)
        assert(s.substring(t.start, t.end) == t.text)
      }
    }
  }

  test("property: sentence offsets cover their text exactly") {
    forAll(Gen.asciiPrintableStr) { s =>
      BioTokenizer.sentences(s).foreach { sent =>
        assert(s.substring(sent.start, sent.end) == sent.text)
      }
    }
  }

  test("property: abbreviation definitions obey min(|A|+5, |A|*2) tokens") {
    forAll(text) { t =>
      AbbreviationFinder.find(t).foreach { a =>
        val tokens = a.long.split("\\s+").count(_.nonEmpty)
        assert(tokens <= math.min(a.short.length + 5, a.short.length * 2))
        assert(a.short.length >= 2 && a.short.length <= 10)
      }
    }
  }

  test("property: jaccard symmetric, bounded, reflexive") {
    forAll(text, text) { (a, b) =>
      val sa = Hashing.shingleSet(a, 2)
      val sb = Hashing.shingleSet(b, 2)
      val j = Hashing.jaccardSorted(sa, sb)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == Hashing.jaccardSorted(sb, sa))
      assert(Hashing.jaccardSorted(sa, sa) == 1.0)
    }
  }

  test("property: jaccardCounts consistent with jaccardSorted") {
    forAll(text, text) { (a, b) =>
      val sa = Hashing.shingleSet(a, 2)
      val sb = Hashing.shingleSet(b, 2)
      val (inter, union) = Hashing.jaccardCounts(sa, sb)
      assert(inter >= 0 && inter <= math.min(sa.length, sb.length))
      assert(union == sa.length + sb.length - inter)
      if (union > 0)
        assert(Hashing.jaccardSorted(sa, sb) == inter.toDouble / union)
      assert(Hashing.jaccardCounts(sb, sa) == ((inter, union)))
    }
  }

  test("property: minhash estimate approximates exact jaccard") {
    // identical → estimate 1; disjoint-ish → estimate low
    forAll(text.suchThat(_.split(" ").count(_.nonEmpty) > 5)) { t =>
      val s = Hashing.shingleSet(t, 2)
      val sig1 = Hashing.minhash(s, 128)
      val sig2 = Hashing.minhash(s, 128)
      assert(sig1.sameElements(sig2))
    }
  }

  test("property: simhash of similar texts has small hamming distance") {
    forAll(text.suchThat(_.split(" ").count(_.nonEmpty) > 20)) { t =>
      val words = t.split(" ").filter(_.nonEmpty)
      val t2 = (words.dropRight(1) :+ "zzzz").mkString(" ") // one word changed
      val h = java.lang.Long.bitCount(Hashing.simhash(t) ^ Hashing.simhash(t2))
      assert(h <= 24, s"hamming $h too large for near-identical docs")
    }
  }

  test("property: normalizer output is ascii and idempotent") {
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('α', 'β', 'é', 'ü', ' ', '-'))).map(_.mkString)) { s =>
      val n = TextNormalizer.normalize(s)
      assert(n.forall(_ < 128))
      assert(TextNormalizer.normalize(n) == n)
    }
  }

  test("property: markTagsInText stripped of markup equals input") {
    forAll(text.suchThat(_.length > 10), Gen.listOf(span)) { (t, spans) =>
      val tags = spans.collect { case (s, e) if e <= t.length => mkTag(s, e) }
      val marked = BioentityTagger.markTagsInText(t, tags)
      val stripped = marked.replaceAll("<[^>]+>", "")
      assert(stripped == t)
    }
  }

  test("property: KMV merge is commutative, associative-consistent, bounded") {
    val agg = new graft.datapipe.Sketches.KmvAgg(8)
    val buf: Gen[Array[Long]] = Gen.listOf(Gen.choose(0L, 1000L))
      .map(_.distinct.sorted.take(8).toArray)
    forAll(buf, buf) { (a, b) =>
      val ab = agg.merge(a, b)
      val ba = agg.merge(b, a)
      assert(ab.toSeq == ba.toSeq)                     // commutative
      assert(ab.length <= 8)                           // bounded
      assert(ab.toSeq == ab.toSeq.distinct.sorted)     // sorted distinct
      // merge equals insert-one-at-a-time (reduce/merge consistency)
      val viaReduce = b.foldLeft(a)(agg.reduce)
      assert(ab.toSeq == viaReduce.toSeq)
      // merging with itself is identity
      assert(agg.merge(a, a).toSeq == a.toSeq)
    }
  }

  test("property: z-order interleave preserves per-axis order at fixed other axis") {
    import graft.functions.ZOrder2Expr.interleave
    val int: Gen[Int] = Gen.oneOf(Gen.choose(-1000, 1000),
      Gen.oneOf(Int.MinValue, Int.MaxValue, 0, -1, 1))
    forAll(int, int) { (a, b) =>
      if (a < Int.MaxValue) {
        assert(interleave(a, b) < interleave(a + 1, b)) // x-axis monotone
        assert(interleave(b, a) < interleave(b, a + 1)) // y-axis monotone
      }
      // bijective on the sampled pairs: decode by bit-deinterleave
      val z = interleave(a, b) ^ Long.MinValue
      def unspread(x0: Long): Int = {
        var x = x0 & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
        x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
        x = (x | (x >> 8)) & 0x0000ffff0000ffffL
        x = (x | (x >> 16)) & 0x00000000ffffffffL
        x.toInt
      }
      assert((unspread(z >>> 1) ^ Int.MinValue) == a)
      assert((unspread(z) ^ Int.MinValue) == b)
    }
  }

  test("property: levenshtein length band is exactness-preserving") {
    // |len(a) - len(b)| > d implies lev(a, b) > d (the q60 pruning rule)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    forAll(word, word) { (a, b) =>
      assert(lev(a, b) >= math.abs(a.length - b.length))
    }
  }
}
