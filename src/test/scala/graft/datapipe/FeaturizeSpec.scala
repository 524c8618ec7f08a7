package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class FeaturizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def bucket(gram: String, dim: Int): Int =
    (Hashing.fnv64(gram) & (dim - 1)).toInt

  test("hand-computed projection: 3-gram counts, buckets, L2 norm") {
    // "abcde" (lowercased from mixed case) → grams abc, bcd, cde
    val v = Featurize.embed("AbCdE", 32, 3)
    val counts = new Array[Long](32)
    Seq("abc", "bcd", "cde").foreach(g => counts(bucket(g, 32)) += 1)
    val s2 = counts.map(c => c * c).sum
    val expected = counts.map(c => (c.toDouble / math.sqrt(s2.toDouble)).toFloat)
    assert(v.toSeq == expected.toSeq)
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("sub-length, empty, and null text") {
    // shorter than n: the whole text is one gram
    val v = Featurize.embed("ab", 32, 3)
    assert(v(bucket("ab", 32)) == 1.0f && v.map(x => x * x).sum == 1.0f)
    assert(Featurize.embed("", 32, 3).forall(_ == 0.0f))
    assert(Featurize.embed(null, 32, 3).forall(_ == 0.0f))
  }

  test("astral-plane codepoints are single gram symbols (DuckDB substr convention)") {
    // three emoji = six UTF-16 chars but three CODEPOINTS → exactly one
    // 3-gram, whose fnv64 codepoint fold equals the string's own fold
    val s = new String(Character.toChars(0x1f600)) +
      new String(Character.toChars(0x1f601)) + new String(Character.toChars(0x1f602))
    val v = Featurize.embed(s, 32, 3)
    assert(v(bucket(s, 32)) == 1.0f && v.map(x => x * x).sum == 1.0f)
  }

  test("embedDocuments matches the per-row twin over the real table") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Featurize.embedDocuments(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val expect = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Featurize.embed(r.getString(1), 32, 3).toSeq).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("dim must be a power of two (mask == unsigned modulo)") {
    intercept[IllegalArgumentException](Featurize.embed("abc", 24, 3))
  }
}
