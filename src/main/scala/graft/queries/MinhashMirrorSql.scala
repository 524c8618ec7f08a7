package graft.queries

import graft.util.Tok

/** DuckDB SQL mirror of the engine's MinHash-LSH banding
  * ([[graft.datapipe.Hashing]]: fnv64 → shingle mix64-fold → 128-perm
  * signature → 32 band keys → buckets of 2..64 members), so the q13/
  * q54/q55 oracles test the SAME candidate set the engine verifies
  * instead of brute-forcing all pairs.
  *
  * Why this matters: the engine's documented semantics are "LSH
  * candidates, exact-verified". A brute-force oracle only agrees while
  * the corpus has no borderline pairs (a pair at exactly J = 0.5
  * escapes 32×4 banding with probability ≈ 13%); with the mirrored
  * band keys, engine and oracle agree for ANY corpus by construction.
  *
  * Mechanics: DuckDB has no wrapping 64-bit arithmetic (BIGINT and
  * UBIGINT both throw on overflow), so the splitmix64 finalizer is
  * emulated in HUGEINT — wrapping multiply via 32-bit limb
  * decomposition mod 2^64, wrapping add via HUGEINT mod 2^64; `//` on
  * UBIGINT is a logical right shift, `xor()` is native. The hot
  * 128-permutation loop runs as staged relational CTE columns (no
  * textual expression duplication); the short per-shingle and per-band
  * folds run as `list_reduce` lambdas with the finalizer inlined.
  *
  * Fidelity invariant: fnv64 folds Unicode CODEPOINTS on BOTH sides —
  * the engine iterates codepoints (surrogate pairs fold as one value,
  * [[graft.datapipe.Hashing.fnv64]]) and this mirror folds
  * `ord(char)`, so the hashes agree for ANY text, BMP and astral
  * plane alike (pinned by HashingFidelitySpec and the q91 non-ASCII
  * corpus oracle, not just assumed for ASCII corpora).
  */
object MinhashMirrorSql {

  // constants from graft.datapipe.Hashing, as unsigned decimal
  private val FnvBasis = "14695981039346656037::UBIGINT" // 0xcbf29ce484222325
  private val FnvPrime = "1099511628211::UBIGINT"        // 0x100000001b3
  private val Golden = "11400714819323198485::UBIGINT"   // 0x9e3779b97f4a7c15
  private val Mix1 = "13787848793156543929::UBIGINT"     // 0xbf58476d1ce4e5b9
  private val Mix2 = "10723151780598845931::UBIGINT"     // 0x94d049bb133111eb
  private val ShingleSeed = "2685821657736338717::UBIGINT" // 0x2545f4914f6cdd1d
  private val BandSeed = "5871781006564002453::UBIGINT"  // 0x517cc1b727220a95

  /** (a * b) mod 2^64 in HUGEINT via 32-bit limbs: lo·lo plus the two
    * cross terms shifted 32 (the hi·hi term is ≡ 0 mod 2^64). */
  private def mulmod(a: String, b: String): String = {
    val ah = s"(($a)::HUGEINT // 4294967296)"
    val al = s"(($a)::HUGEINT % 4294967296)"
    val bh = s"(($b)::HUGEINT // 4294967296)"
    val bl = s"(($b)::HUGEINT % 4294967296)"
    s"CAST((($al * $bl + (($ah * $bl + $al * $bh) % 4294967296) * 4294967296)" +
      s" % 18446744073709551616) AS UBIGINT)"
  }

  /** (a + b) mod 2^64. */
  private def addmod(a: String, b: String): String =
    s"CAST(((($a)::HUGEINT + ($b)::HUGEINT) % 18446744073709551616) AS UBIGINT)"

  /** splitmix64 finalizer (Hashing.mix64) over a SMALL expression `z`
    * — z is textually replicated, so pass a variable/column name. */
  private def mix64(z: String): String = {
    val z1 = addmod(z, Golden)
    val x1 = s"xor($z1, ($z1 // 1073741824))"  // >>> 30
    val z2 = mulmod(x1, Mix1)
    val x2 = s"xor($z2, ($z2 // 134217728))"   // >>> 27
    val z3 = mulmod(x2, Mix2)
    s"xor($z3, ($z3 // 2147483648))"           // >>> 31
  }

  /** fnv64 of a token `t` (lambda var): fold codepoints with
    * h = (h ^ c) * prime, seeded with the FNV offset basis. Shared
    * with the q105 featurizer oracle (char-n-gram bucket hashing). */
  private[queries] def fnvSql(t: String): String =
    s"list_reduce(list_prepend($FnvBasis, " +
      s"list_transform(range(1, length($t) + 1), " +
      s"fi -> CAST(ord($t[fi:fi]) AS UBIGINT))), " +
      s"(fh, fc) -> ${mulmod("xor(fh, fc)", FnvPrime)})"

  /** Hashing.shingleHash: seed-fold h = mix64(h ^ tokenHash) over an
    * ordered token-hash list expression. */
  private def shingleFold(lst: String): String =
    s"list_reduce(list_prepend($ShingleSeed, $lst), " +
      s"(sh0, sx0) -> ${mix64("xor(sh0, sx0)")})"

  /** CTE block computing LSH candidate pairs `mh_cand(id_a, id_b)`
    * from a CTE `tokCte(doc_id, toks)` (lowercased whitespace tokens,
    * empties filtered — the Tok.WS split every caller already uses).
    * Splice into a WITH chain; names are mh_-prefixed to avoid
    * collisions. Mirrors minhashCandidates defaults: shingleN=3,
    * numPerm=128, bands=32 (rows=4), maxBucket=64. */
  def candidateCtes(tokCte: String): String = {
    val permHash = mulmod(Golden, "CAST(i + 1 AS UBIGINT)")
    s"""mh_th AS (
       |  SELECT doc_id, list_transform(toks, t -> ${fnvSql("t")}) AS ths
       |  FROM $tokCte WHERE len(toks) > 0
       |), mh_sh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(ths) < 3 THEN [${shingleFold("ths")}]
       |    ELSE list_transform(range(1, len(ths) - 1), si -> ${shingleFold("ths[si:si+2]")}) END) AS shh
       |  FROM mh_th
       |), mh_sx AS (
       |  SELECT doc_id, unnest(shh) AS s FROM mh_sh
       |), mh_pz AS (
       |  SELECT doc_id, i, xor(s, $permHash) AS z
       |  FROM mh_sx CROSS JOIN (SELECT unnest(range(0, 128)) AS i)
       |), mh_p1 AS (SELECT doc_id, i, ${addmod("z", Golden)} AS z1 FROM mh_pz
       |), mh_p2 AS (SELECT doc_id, i, ${mulmod("xor(z1, (z1 // 1073741824))", Mix1)} AS z2 FROM mh_p1
       |), mh_p3 AS (SELECT doc_id, i, ${mulmod("xor(z2, (z2 // 134217728))", Mix2)} AS z3 FROM mh_p2
       |), mh_ph AS (SELECT doc_id, i, xor(z3, (z3 // 2147483648)) AS h FROM mh_p3
       |), mh_min AS (
       |  SELECT doc_id, i, MIN(h) AS m FROM mh_ph GROUP BY doc_id, i
       |), mh_bk AS (
       |  SELECT doc_id, (i // 4) AS b,
       |    list_reduce(list_prepend(xor($BandSeed, CAST(i // 4 AS UBIGINT)), list(m ORDER BY i)),
       |      (bh0, bx0) -> ${mix64("xor(bh0, bx0)")}) AS bk
       |  FROM mh_min GROUP BY doc_id, (i // 4)
       |), mh_bsz AS (
       |  SELECT doc_id, b, bk, COUNT(*) OVER (PARTITION BY b, bk) AS bn FROM mh_bk
       |), mh_cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM mh_bsz a JOIN mh_bsz c
       |    ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id AND a.bn <= 64
       |)""".stripMargin
  }

  /** The standard token CTE over a documents-shaped relation. */
  def tokCte(source: String): String =
    s"""mh_tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM $source
       |)""".stripMargin
}
