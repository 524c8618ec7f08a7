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
}
