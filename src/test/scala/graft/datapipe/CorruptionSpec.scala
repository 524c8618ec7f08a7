package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Corruption.spanCorrupt]] — deterministic T5-style denoising pairs. */
class CorruptionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(rate: Double, salt: String, texts: (Long, String)*) = {
    import spark.implicits._
    Corruption.spanCorrupt(texts.toDF("doc_id", "text"),
        rate = rate, salt = salt)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("input and target partition the document; sentinels line up") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ")
    val r = run(0.3, "s1", 1L -> text)(1L)
    val masked = r.getAs[Long]("n_masked")
    val spans = r.getAs[Long]("n_spans")
    assert(masked > 20 && masked < 100) // ~60 expected at rate 0.3
    assert(spans >= 1 && spans <= masked)
    val inp = r.getAs[String]("input_text")
    val tgt = r.getAs[String]("target_text")
    // sentinel sets agree and are consecutively numbered from 0
    val sentRe = "<extra_id_(\\d+)>".r
    val inS = sentRe.findAllMatchIn(inp).map(_.group(1).toInt).toSeq
    val tgS = sentRe.findAllMatchIn(tgt).map(_.group(1).toInt).toSeq
    assert(inS == (0 until spans.toInt) && tgS == inS)
    // reconstruction: splicing each target span at its sentinel
    // restores the original token stream
    val spanMap = tgt.split("<extra_id_\\d+> ?").drop(1)
      .map(_.trim).zipWithIndex.map { case (s, k) => k -> s }.toMap
    val rebuilt = sentRe.replaceAllIn(inp,
        m => java.util.regex.Matcher.quoteReplacement(
          spanMap(m.group(1).toInt)))
      .replaceAll("  +", " ").trim
    assert(rebuilt == text)
    // token accounting: unmasked tokens in input + masked in target
    assert(masked == spanMap.values.map(
      _.split(" ").count(_.nonEmpty)).sum)
  }

  test("mask is a pure function: same salt identical, new salt differs") {
    val text = (1 to 300).map(i => s"t$i").mkString(" ")
    val a = run(0.15, "ep0", 1L -> text)(1L).getAs[String]("input_text")
    val b = run(0.15, "ep0", 1L -> text)(1L).getAs[String]("input_text")
    val c = run(0.15, "ep1", 1L -> text)(1L).getAs[String]("input_text")
    assert(a == b && a != c)
  }

  test("empty and null docs emit empty pairs; rate bounds enforced") {
    val r = run(0.15, "s", 1L -> "", 2L -> null.asInstanceOf[String])
    for (id <- Seq(1L, 2L)) {
      assert(r(id).getAs[Long]("n_tokens") == 0L)
      assert(r(id).getAs[String]("input_text") == "")
      assert(r(id).getAs[String]("target_text") == "")
    }
    intercept[IllegalArgumentException] {
      Corruption.spanCorrupt(null, rate = 0.0)
    }
  }

  test("corruption is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 30L).map(i =>
      i -> (1 to 50).map(j => s"x${i}_$j").mkString(" "))
    val a = Corruption.spanCorrupt(
        docs.toDF("doc_id", "text").repartition(1), salt = "p")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Corruption.spanCorrupt(
        docs.toDF("doc_id", "text").repartition(7), salt = "p")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
