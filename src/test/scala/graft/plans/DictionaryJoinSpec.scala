package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The custom planner strategy must produce identical results to the
  * BroadcastNestedLoopJoin it replaces, and actually appear in the
  * physical plan. */
class DictionaryJoinSpec extends AnyFunSuite {

  // dedicated session: extensions only apply at session construction
  lazy val spark: SparkSession = {
    // the shared test session may exist; build on the same context with
    // extensions injected via the experimental methods instead
    val s = graft.SparkTestSession.spark.newSession()
    s.experimental.extraStrategies = Seq(DictionaryJoinStrategy)
    s
  }

  def data = {
    import spark.implicits._
    val docs = Seq(
      (1L, "severe asthma and airway inflammation observed"),
      (2L, "no relevant disease terms here"),
      (3L, "asthma, schizophrenia and more asthma"),
      (4L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val vocab = Seq(
      ("asthma", "DISEASE"),
      ("schizophrenia", "DISEASE"),
      ("airway inflammation", "DISEASE"),
    ).toDF("surface", "category")
    (docs, vocab)
  }

  test("strategy plans AutomatonJoinExec for contains() inner joins") {
    val (docs, vocab) = data
    val joined = docs.join(vocab, expr("contains(text, surface)"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AutomatonJoin"), plan)
  }

  test("results identical to the nested-loop join") {
    val (docs, vocab) = data
    val fast = docs.join(vocab, expr("contains(text, surface)"))
      .select("doc_id", "surface", "category")
    // reference result: same join on a session without the strategy
    val base = graft.SparkTestSession.spark
    import base.implicits._
    val docsB = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text")
    val vocabB = vocab.collect().map(r => (r.getString(0), r.getString(1))).toSeq.toDF("surface", "category")
    val slow = docsB.join(vocabB, expr("contains(text, surface)"))
      .select("doc_id", "surface", "category")
    val f = fast.collect().map(_.toString).sorted.toSeq
    val s = slow.collect().map(_.toString).sorted.toSeq
    assert(f == s)
    assert(f.nonEmpty)
    // doc 3 matches asthma once (not twice) + schizophrenia
    assert(f.count(_.contains("[3,")) == 2)
  }

  test("semi and anti joins plan through the strategy with BNLJ-identical results") {
    val (docs, vocab) = data
    for (jt <- Seq("left_semi", "left_anti")) {
      val fast = docs.join(vocab, expr("contains(text, surface)"), jt)
      assert(fast.queryExecution.executedPlan.toString.contains("AutomatonJoin"),
        s"$jt not planned through the strategy")
      val base = graft.SparkTestSession.spark
      import base.implicits._
      val docsB = docs.collect().map(r =>
        (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text")
      val vocabB = vocab.collect().map(r =>
        (r.getString(0), r.getString(1))).toSeq.toDF("surface", "category")
      val slow = docsB.join(vocabB, expr("contains(text, surface)"), jt)
      val f = fast.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val s = slow.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(f == s, s"$jt: fast=$f slow=$s")
    }
    // anti keeps the null-text row (contains(null, s) is not TRUE)
    val anti = docs.join(vocab, expr("contains(text, surface)"), "left_anti")
    assert(anti.collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("empty-string surface: semi keeps every non-null text, anti only null") {
    import spark.implicits._
    val docs = Seq((1L, "anything"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = Seq("").toDF("surface")
    val semi = docs.join(vocab, expr("contains(text, surface)"), "left_semi")
    assert(semi.collect().map(_.getLong(0)).toSet == Set(1L))
    val anti = docs.join(vocab, expr("contains(text, surface)"), "left_anti")
    assert(anti.collect().map(_.getLong(0)).toSet == Set(2L))
    // inner: one row per (doc, empty-surface) pair for non-null text
    val inner = docs.join(vocab, expr("contains(text, surface)"), "inner")
    assert(inner.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
