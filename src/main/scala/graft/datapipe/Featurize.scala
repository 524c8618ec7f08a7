package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic text featurizer: a hashed char-n-gram projection
  * turning raw text into a dense L2-normalized embedding — the
  * missing link that lets the semantic pipeline (k-means q95,
  * SemDeDup q96, leak-free splits q101, the q103 funnel) run on a
  * corpus that arrives as TEXT ONLY, with no model-produced
  * embedding column (the classic hashing trick / feature hashing,
  * Weinberger et al. 2009).
  *
  * Construction (every step replayable arithmetically by a DuckDB
  * oracle — no RNG, no floats until the final normalize):
  *  - lowercase (Locale.ROOT — the engine/oracle `lower()`
  *    convention shared with [[Contamination]]);
  *  - slide a CODEPOINT n-gram window (surrogate pairs are one
  *    symbol, matching DuckDB's codepoint `substr`; text shorter
  *    than n contributes its whole self as one gram; empty/null
  *    text → the zero vector);
  *  - bucket each gram by [[Hashing.fnv64]] masked to `dim` buckets
  *    (dim must be a power of two so the signed mask equals the
  *    oracle's unsigned modulo) and count occurrences → an integer
  *    count vector;
  *  - L2-normalize: x_i = (c_i / √Σc²) rounded once to float. Both
  *    divide and sqrt are correctly-rounded IEEE doubles in the JVM
  *    and DuckDB alike, so the floats agree bit-for-bit.
  *
  * Scale shape: a stateless narrow per-row map — no shuffle, no
  * state, runs unchanged on a streaming DataFrame. The per-row loop
  * is a justified UDF (same precedent as the k-means assignment
  * argmin: there is no codegen builtin for a hash-bucketed counting
  * loop, and interpreted higher-order functions cost ~50× more).
  */
object Featurize {

  /** Driver/executor twin: the projection of one text. */
  def embed(text: String, dim: Int, n: Int): Array[Float] = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    require(n > 0, s"n must be positive, got $n")
    val counts = new Array[Long](dim)
    if (text != null && text.nonEmpty) {
      val t = text.toLowerCase(java.util.Locale.ROOT)
      val cps = t.codePoints().toArray
      val span = math.min(n, cps.length)
      var i = 0
      while (i + span <= cps.length) {
        var h = 0xcbf29ce484222325L // FNV-1a over the gram's codepoints
        var j = 0
        while (j < span) {
          h ^= cps(i + j)
          h *= 0x100000001b3L
          j += 1
        }
        counts((h & (dim - 1)).toInt) += 1
        i += 1
      }
    }
    var s2 = 0L
    var i = 0
    while (i < dim) { s2 += counts(i) * counts(i); i += 1 }
    val out = new Array[Float](dim)
    if (s2 > 0L) {
      val norm = math.sqrt(s2.toDouble)
      i = 0
      while (i < dim) { out(i) = (counts(i).toDouble / norm).toFloat; i += 1 }
    }
    out
  }

  /** (vec_id, embedding) projection of a (id, text) relation —
    * drop-in source for every embedding consumer ([[Clustering]],
    * [[Similarity]]). */
  def embedDocuments(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 32, n: Int = 3): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    require(n > 0, s"n must be positive, got $n")
    val f = udf((t: String) => embed(t, dim, n).toSeq)
    docs.select(col(idCol).as("vec_id"), f(col(textCol)).as("embedding"))
  }
}
