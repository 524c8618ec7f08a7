package graft.datapipe

import graft.util.Tok

/** Deterministic hashing primitives for the dedup/similarity family.
  * Pure functions, fixed constants — results are reproducible across
  * runs, executors, and engines (a requirement for the driver's
  * hash-compared outputs and for incremental dedup at scale).
  */
object Hashing {

  /** splitmix64 finalizer — strong 64-bit avalanche. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a string's Unicode CODEPOINTS (no allocation).
    * Codepoint folding — a surrogate pair folds as one value — keeps
    * the hash identical to the DuckDB oracle mirror's `ord()` fold
    * ([[graft.queries.MinhashMirrorSql]]) on ALL text, astral plane
    * included; for BMP text it coincides with the historical UTF-16
    * per-char fold, so every ASCII-corpus hash is unchanged.
    * Unpaired surrogates fold as their own char value (same as
    * String#codePointAt's lenient contract).
    *
    * HASH-CONVENTION BREAK (round 10): the switch from UTF-16 char
    * folding to codepoint folding changed hash values for astral-plane
    * text. Persisted artifacts keyed by the OLD hashes — e.g. the
    * incremental near-dup postings index written by a pre-round-10
    * build ([[DedupOps]] persisted index, streaming near-dup state) —
    * must be rebuilt before probing with new-code hashes; old state is
    * NOT silently compatible unless the corpus is BMP-only. */
  def fnv64(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var cp: Int = c
      if (Character.isHighSurrogate(c) && i + 1 < s.length) {
        val lo = s.charAt(i + 1)
        if (Character.isLowSurrogate(lo)) {
          cp = Character.toCodePoint(c, lo)
          i += 1
        }
      }
      h ^= cp
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Hash of a word n-gram (shingle) given pre-hashed tokens. */
  def shingleHash(tokenHashes: Array[Long], start: Int, n: Int): Long = {
    var h = 0x2545f4914f6cdd1dL
    var i = 0
    while (i < n) {
      h = mix64(h ^ tokenHashes(start + i))
      i += 1
    }
    h
  }

  /** Lowercased whitespace tokens hashed to longs. */
  def tokenHashes(text: String): Array[Long] = {
    val toks = text.toLowerCase.split(Tok.WS).filter(_.nonEmpty)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = fnv64(toks(i)); i += 1 }
    out
  }

  /** Distinct word-shingle hashes of size n (n-gram set of the doc). */
  def shingleSet(text: String, n: Int): Array[Long] = {
    val th = tokenHashes(text)
    if (th.length < n) {
      if (th.isEmpty) Array.empty else Array(shingleHash(th, 0, th.length))
    } else {
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + n <= th.length) { set.add(shingleHash(th, i, n)); i += 1 }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** MinHash signature: numPerm independent min-hash values over the
    * shingle set (perm i = mix64(shingle ^ seed_i)). */
  def minhash(shingles: Array[Long], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val s = shingles(si)
      var i = 0
      while (i < numPerm) {
        val h = mix64(s ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  /** Fused shingle→minhash→band pipeline over ArrayData, for the native
    * Catalyst expression (MinHashBandsExpr): one call per row, primitive
    * arrays end-to-end, result wrapped without boxing. */
  def minhashBandsArrayData(text: org.apache.spark.unsafe.types.UTF8String,
      numPerm: Int, shingleN: Int, bands: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      bandKeys(minhash(shingleSet(text.toString, shingleN), numPerm), bands))

  // ---- engine-portable (md5-based) minhash ----

  /** 2^61 − 1, a Mersenne prime: modulus of the portable permutation
    * family h_i(x) = (a_i·x + b_i) mod p. Chosen so any engine with
    * 128-bit integers can evaluate h_i exactly (a_i, x < 2^61 ⇒ product
    * < 2^122, inside a signed 128-bit range), which lets the DuckDB
    * correctness oracle recompute the LSH band keys bit-for-bit. */
  val P61: Long = (1L << 61) - 1

  /** Fixed permutation coefficients — pure functions of the index, so
    * the engine and the GENERATED oracle SQL embed identical values. */
  def permA(i: Int): Long =
    java.lang.Long.remainderUnsigned(mix64(0xa075bcd15f4a7c15L + i), P61 - 1) + 1
  def permB(i: Int): Long =
    java.lang.Long.remainderUnsigned(mix64(0x3c6ef372fe94f82bL + i), P61)

  /** (a·x) mod (2^61−1) without 64-bit overflow: the 128-bit product
    * hi·2^64 + lo folds via 2^64 ≡ 8 and 2^61 ≡ 1 (mod p). Requires
    * 0 ≤ a, x < 2^61 (so hi < 2^58 and hi·8 cannot overflow). */
  def mulmodP61(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    var r = (hi << 3) + (lo >>> 61) + (lo & P61)
    if (r >= P61) r -= P61
    if (r >= P61) r -= P61
    r
  }

  /** Distinct word-shingle STRINGS (n consecutive lowercased tokens
    * joined by ' '), first-seen order; docs shorter than n collapse to
    * one whole-doc shingle. String form (not [[shingleSet]]'s fnv
    * hashes) because the oracle rebuilds the same strings with
    * array_to_string. */
  def shingleStrings(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split(Tok.WS).filter(_.nonEmpty)
    if (toks.isEmpty) Array.empty
    else if (toks.length < n) Array(toks.mkString(" "))
    else {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) { set.add(toks.slice(i, i + n).mkString(" ")); i += 1 }
      set.toArray(new Array[String](set.size))
    }
  }

  /** Engine-portable LSH band keys: ONE md5 per shingle (the u64 of
    * bytes 8..15 little-endian == DuckDB's md5_number_lower, see
    * [[md5Low64]]), numPerm permutations via (a_i·x + b_i) mod 2^61−1,
    * band key = comma-joined row minima. Every step is recomputable in
    * DuckDB SQL, so the q13/q54/q55 oracles mirror the CANDIDATE SET
    * exactly instead of assuming total LSH recall — a borderline pair
    * (J ≈ threshold) that escapes banding now escapes both engines
    * identically. Slightly slower than the fnv/mix64 fast path
    * ([[minhash]] + [[bandKeys]]); use that when oracle portability is
    * not needed. */
  private lazy val PermA128 = Array.tabulate(128)(permA)
  private lazy val PermB128 = Array.tabulate(128)(permB)

  /** The md5-permutation MinHash SIGNATURE alone (numPerm minima) —
    * the config-independent half of [[minhashBandsMd5]], exposed so a
    * band-config sweep (q158) computes the expensive per-shingle md5
    * pass ONCE and regroups the minima per config with column ops. */
  def minhashSigMd5(text: String, numPerm: Int, shingleN: Int): Array[Long] = {
    val sh = shingleStrings(text, shingleN)
    // hoisted coefficient arrays for the common numPerm (per-row
    // tabulate would allocate 2x128 longs for every document)
    val as = if (numPerm <= 128) PermA128 else Array.tabulate(numPerm)(permA)
    val bs = if (numPerm <= 128) PermB128 else Array.tabulate(numPerm)(permB)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var si = 0
    while (si < sh.length) {
      val x = java.lang.Long.remainderUnsigned(md5Low64(md, sh(si)), P61)
      var i = 0
      while (i < numPerm) {
        var h = mulmodP61(as(i), x) + bs(i)
        if (h >= P61) h -= P61
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  def minhashSigMd5ArrayData(text: org.apache.spark.unsafe.types.UTF8String,
      numPerm: Int, shingleN: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      minhashSigMd5(text.toString, numPerm, shingleN))

  def minhashBandsMd5(text: String, numPerm: Int, shingleN: Int, bands: Int): Array[String] = {
    val sig = minhashSigMd5(text, numPerm, shingleN)
    val rows = numPerm / bands
    Array.tabulate(bands) { b =>
      val sb = new java.lang.StringBuilder(rows * 20)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(sig(b * rows + r))
        r += 1
      }
      sb.toString
    }
  }

  /** [[minhashBandsMd5]] wrapped for the native Catalyst expression
    * (MinHashBandsMd5Expr): UTF8String in, ArrayData of UTF8String out
    * — same call shape as [[minhashBandsArrayData]]. */
  def minhashBandsMd5ArrayData(text: org.apache.spark.unsafe.types.UTF8String,
      numPerm: Int, shingleN: Int, bands: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      minhashBandsMd5(text.toString, numPerm, shingleN, bands)
        .map(org.apache.spark.unsafe.types.UTF8String.fromString))

  /** LSH band keys: hash each of `bands` signature slices of length
    * rows = numPerm/bands. Same band key ⇒ candidate pair. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x51_7c_c1_b7_27_22_0a_95L ^ b
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** 64-bit SimHash over token unigram hashes (weight 1 each). */
  def simhash(text: String): Long = {
    val th = tokenHashes(text)
    val acc = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private def md5Low64(md: java.security.MessageDigest, token: String): Long = {
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** Little-endian u64 of md5 bytes 8..15 — exactly DuckDB's
    * `md5_number_lower`, so simhashes built from it are recomputable by
    * the SQL oracle (engine-portable, unlike [[fnv64]]). */
  def md5Low64(token: String): Long =
    md5Low64(java.security.MessageDigest.getInstance("MD5"), token)

  /** First 16 hex chars of md5(utf8) — exactly Spark's
    * `substring(md5(s), 1, 16)` (and DuckDB's), the sentence-hash key
    * of the [[Spans]] dedup family; the driver/closure twin for
    * streaming probes of those indexes. */
  def md5Hex16(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(16)
    var i = 0
    while (i < 8) { sb.append(f"${d(i)}%02x"); i += 1 }
    sb.toString
  }

  /** 64-bit SimHash over md5-derived token hashes (see [[md5Low64]]).
    * Same majority-vote construction as [[simhash]]; the md5 token hash
    * makes the result reproducible in any engine with md5. One
    * MessageDigest per call, reused across tokens (digest() resets). */
  def simhashMd5(text: String): Long = {
    val toks = text.toLowerCase.split(Tok.WS)
    val acc = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = md5Low64(md, toks(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Exact Jaccard of two sorted distinct hash arrays. */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** [[jaccardCounts]] over catalyst ArrayData of SORTED distinct
    * hashes, packed (inter << 32) | union — one primitive merge per
    * candidate pair with no Seq boxing (the verify stage of the
    * ppjoin/LSH dedup family; see JaccardPackExpr). Inputs must be
    * sorted ascending (as [[shingleSet]] emits). */
  def jaccardPackArrayData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    (inter.toLong << 32) | (na + nb - inter).toLong
  }

  /** Intersection and union sizes of two sorted distinct hash arrays —
    * the integer-exact form of Jaccard (numerator/denominator), safe
    * for cross-engine hash comparison. */
  def jaccardCounts(a: Array[Long], b: Array[Long]): (Int, Int) = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    (inter, a.length + b.length - inter)
  }

  /** Winnowing fingerprints with md5-hex shingle hashes: shingle = n
    * consecutive lowercased tokens joined by ' ', hash = first 16 hex
    * chars of its md5. Fixed-width hex compares lexicographically ==
    * numerically, so per-window minima match any engine's min(). Same
    * window/min/dedup structure as [[winnow]]. */
  def winnowMd5Hex(text: String, shingleSize: Int, window: Int): Array[String] = {
    val toks = text.toLowerCase.split(Tok.WS).filter(_.nonEmpty)
    if (toks.isEmpty) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex16(s: String): String = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(16)
      var i = 0
      while (i < 8) {
        sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(i) & 0xf, 16))
        i += 1
      }
      sb.toString
    }
    if (toks.length < shingleSize) return Array(hex16(toks.mkString(" ")))
    val n = toks.length - shingleSize + 1
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      hashes(i) = hex16(toks.slice(i, i + shingleSize).mkString(" "))
      i += 1
    }
    if (n <= window) return Array(hashes.min)
    val out = new java.util.LinkedHashSet[String]()
    var w = 0
    while (w + window <= n) {
      var m = hashes(w)
      var k = 1
      while (k < window) { if (hashes(w + k).compareTo(m) < 0) m = hashes(w + k); k += 1 }
      out.add(m)
      w += 1
    }
    out.toArray(new Array[String](out.size))
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): min shingle hash per sliding window, deduped. */
  def winnow(text: String, shingleSize: Int, window: Int): Array[Long] = {
    val th = tokenHashes(text)
    if (th.length < shingleSize) return shingleSet(text, shingleSize)
    val n = th.length - shingleSize + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = shingleHash(th, i, shingleSize); i += 1 }
    if (n <= window) return Array(hashes.min)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w + window <= n) {
      var m = hashes(w)
      var k = 1
      while (k < window) { if (hashes(w + k) < m) m = hashes(w + k); k += 1 }
      out.add(m)
      w += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }
}
