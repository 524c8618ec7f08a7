package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Direct automaton correctness: every occurrence of every added word
  * is reported exactly once, including overlapping and nested matches. */
class AhoCorasickSpec extends AnyFunSuite {

  private def bruteForce(text: String, words: Seq[String]): Set[(Int, String)] =
    (for {
      w <- words.distinct if w.nonEmpty
      i <- 0 to text.length - w.length
      if text.regionMatches(i, w, 0, w.length)
    } yield (i + w.length, w)).toSet

  private def scanAll(text: String, words: Seq[String]): Set[(Int, String)] = {
    val b = AhoCorasick.builder[String]
    words.distinct.foreach(w => b.add(w, w))
    val auto = b.build()
    val out = scala.collection.mutable.Set.empty[(Int, String)]
    auto.scan(text)((end, len, w) => { assert(len == w.length); out += ((end, w)) })
    out.toSet
  }

  test("overlapping, nested and suffix matches are all reported") {
    val words = Seq("he", "she", "his", "hers", "herself")
    assert(scanAll("ushers herself his", words) ==
      bruteForce("ushers herself his", words))
  }

  test("repeated occurrences each reported") {
    val got = scanAll("abab", Seq("ab", "ba", "abab"))
    assert(got == Set((2, "ab"), (4, "ab"), (3, "ba"), (4, "abab")))
  }

  test("property: automaton equals brute force on random inputs") {
    val word = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = for {
      ws <- Gen.listOfN(8, word)
      t <- Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    } yield (ws, t)
    var seed = org.scalacheck.rng.Seed(7L)
    (1 to 300).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach { case (ws, t) =>
        assert(scanAll(t, ws) == bruteForce(t, ws), s"words=$ws text=$t")
        // exists == "scan would report >= 1 match"
        val b = AhoCorasick.builder[String]
        ws.distinct.foreach(w => b.add(w, w))
        assert(b.build().exists(t) == bruteForce(t, ws).nonEmpty, s"exists words=$ws text=$t")
      }
      seed = seed.next
    }
  }

  test("merge function combines payloads for duplicate words") {
    val b = AhoCorasick.builder[List[String]]
    b.add("x", List("a"))
    b.add("x", List("b"), (old, add) => old ++ add)
    val auto = b.build()
    var got: List[String] = Nil
    auto.scan("x")((_, _, v) => got = v)
    assert(got == List("a", "b"))
  }
}
