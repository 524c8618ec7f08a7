package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** [[QualityScore.gopherRules]] — the published Gopher keep/drop
  * battery (Rae et al. 2021 §A1.1) as integer-exact flags. Each test
  * crafts a document failing exactly one rule, so a threshold or
  * cross-multiplication slip surfaces as the precise divergent bit.
  */
class QualityRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rules(texts: (Long, String)*) = {
    import spark.implicits._
    QualityScore.gopherRules(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  // 60 words, lengths 3..6, two required stopwords (the, with), fully
  // alphabetic, no symbols — passes all five rules
  private val passing =
    Seq.fill(6)("the quick brown foxes jumped over many lazy dogs with")
      .mkString(" ")

  test("a compliant document passes all five rules") {
    val r = rules(1L -> passing)(1L)
    assert(r.getAs[Long]("n_words") == 60L)
    assert(r.getAs[Long]("n_req_stopwords") == 2L)
    assert(r.getAs[Long]("rules_passed") == 31L)
    assert(r.getAs[Long]("keep") == 1L)
  }

  test("word-count rule (bit 0) fails alone below 50 words") {
    val short = Seq.fill(4)("the quick brown foxes jumped over many lazy dogs with")
      .mkString(" ") // 40 words, everything else compliant
    val r = rules(1L -> short)(1L)
    assert(r.getAs[Long]("rules_passed") == 30L) // 31 - bit0
    assert(r.getAs[Long]("keep") == 0L)
  }

  test("mean-word-length rule (bit 1) fails alone under 3 chars/word") {
    val tiny = (Seq.fill(60)("ab") ++ Seq("the", "with", "the", "with"))
      .mkString(" ") // 64 words, mean ~2.1
    val r = rules(1L -> tiny)(1L)
    assert(r.getAs[Long]("rules_passed") == 29L) // 31 - bit1
  }

  test("symbol-ratio rule (bit 2) fails alone when '#' exceeds 10% of words") {
    val hashy = passing + " " + Seq.fill(8)("#").mkString(" ")
    val r = rules(1L -> hashy)(1L)
    assert(r.getAs[Long]("n_symbols") == 8L)
    assert(r.getAs[Long]("n_words") == 68L)
    assert(r.getAs[Long]("rules_passed") == 27L) // 31 - bit2
  }

  test("ellipsis counts once per occurrence toward the symbol count") {
    val r = rules(1L -> "foo ... bar ... baz")(1L)
    assert(r.getAs[Long]("n_symbols") == 2L)
  }

  test("alpha-word rule (bit 3) fails alone when >20% of words are numeric") {
    val digity = passing + " " + Seq.fill(20)("12345").mkString(" ")
    // 80 words, 20 non-alpha => 75% alpha < 80%
    val r = rules(1L -> digity)(1L)
    assert(r.getAs[Long]("n_alpha_words") == 60L)
    assert(r.getAs[Long]("rules_passed") == 23L) // 31 - bit3
  }

  test("required-stopword rule (bit 4) fails alone with only one list word") {
    val oneStop = Seq.fill(6)("the quick brown foxes jumped over many lazy dogs here")
      .mkString(" ") // only 'the' from the required list
    val r = rules(1L -> oneStop)(1L)
    assert(r.getAs[Long]("n_req_stopwords") == 1L)
    assert(r.getAs[Long]("rules_passed") == 15L) // 31 - bit4
  }

  test("empty and null text get the zero-word mask, not a crash") {
    val rs = rules(1L -> "", 2L -> null)
    for (id <- Seq(1L, 2L)) {
      val r = rs(id)
      assert(r.getAs[Long]("n_words") == 0L)
      // bits 2 (0 <= 0) and 3 (0 >= 0) hold vacuously; 0/1/4 fail
      assert(r.getAs[Long]("rules_passed") == 12L)
      assert(r.getAs[Long]("keep") == 0L)
    }
  }

  test("the battery is one exchange-free narrow projection") {
    import spark.implicits._
    val plan = QualityScore.gopherRules(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
