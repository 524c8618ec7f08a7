package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[QualityScore.charEntropy]] — exact fixed-point Shannon entropy. */
class CharEntropySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ent(texts: (Long, String)*) = {
    import spark.implicits._
    QualityScore.charEntropy(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("uniform 4-char alphabet is exactly 2 bits/char") {
    val r = ent(1L -> "abcd")(1L)
    assert(r.getAs[Long]("n_cp") == 4L)
    assert(r.getAs[Long]("ent_nfp") == 4L * 2 * 65536)
    assert(r.getAs[Long]("milli_bits_per_char") == 2000L)
  }

  test("single repeated char is zero entropy; empty and null are zeroed") {
    val r = ent(1L -> "aaaaaaaa", 2L -> "", 3L -> null.asInstanceOf[String])
    assert(r(1L).getAs[Long]("ent_nfp") == 0L)
    assert(r(1L).getAs[Long]("milli_bits_per_char") == 0L)
    for (id <- Seq(2L, 3L)) {
      assert(r(id).getAs[Long]("n_cp") == 0L)
      assert(r(id).getAs[Long]("ent_nfp") == 0L)
    }
  }

  test("tracks true Shannon entropy within fixed-point tolerance") {
    val texts = Seq(1L -> "hello world, this is ordinary prose text.",
      2L -> "aAbBcCdDeEfFgG0123456789!@#$%^&*()",
      3L -> "zzzzzzzzzzzy")
    val r = ent(texts: _*)
    for ((id, t) <- texts) {
      val counts = t.groupBy(identity).values.map(_.length.toDouble)
      val n = t.length.toDouble
      val h = counts.map(c => -c / n * math.log(c / n) / math.log(2)).sum
      val got = r(id).getAs[Long]("ent_nfp").toDouble / (n * 65536.0)
      assert(math.abs(got - h) < 1e-3, s"doc $id: got $got want $h")
    }
  }

  test("codepoints, not UTF-16 units: astral chars count once") {
    // 𝔘 (U+1D518) twice + 'x' twice: 4 codepoints, H = 1 bit
    val r = ent(1L -> "𝔘x𝔘x")(1L)
    assert(r.getAs[Long]("n_cp") == 4L)
    assert(r.getAs[Long]("milli_bits_per_char") == 1000L)
  }
}
