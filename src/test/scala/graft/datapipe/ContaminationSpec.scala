package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  def corpus() = {
    import spark.implicits._
    // eval doc: "x y z w" → 3-gram shingles {"x y z", "y z w"}
    val eval_ = Seq((100L, "x y z w")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x y z w q"),     // shares BOTH eval shingles
      (2L, "a x y z b"),     // shares one ("x y z")
      (3L, "totally clean text here"),
      (4L, ""),              // empty → never flagged, must survive
    ).toDF("doc_id", "text")
    (train, eval_)
  }

  test("contaminated counts distinct shared shingles per training doc") {
    val (train, eval_) = corpus()
    val got = Contamination.contaminated(train, eval_, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("decontaminate removes only docs at or above minShared, keeps all columns") {
    val (train, eval_) = corpus()
    val kept1 = Contamination.decontaminate(train, eval_, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(3L, 4L))
    val kept2 = Contamination.decontaminate(train, eval_, "doc_id", "text", 3,
      minShared = 2L)
    assert(kept2.columns.toSeq == Seq("doc_id", "text"))
    assert(kept2.collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
  }

  test("bloom-pruned path equals the exact path on the real table") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = canon(Contamination.contaminated(train, eval_, "doc_id", "text", 3))
    val bloom = canon(Contamination.contaminatedBloomPruned(train, eval_, "doc_id", "text", 3))
    assert(exact == bloom)
    // an aggressive fpp changes nothing: false positives die in the verify join
    val sloppy = canon(Contamination.contaminatedBloomPruned(
      train, eval_, "doc_id", "text", 3, fpp = 0.5))
    assert(exact == sloppy)
  }

  test("the bloom probe prunes non-matching postings before the verify join") {
    val (train, eval_) = corpus()
    // doc 3 shares nothing with eval: all its postings must fail the
    // probe (no false positive at fpp 1e-7 over 2 items), so the
    // exact-verify join input carries only docs 1 and 2
    val got = Contamination.contaminatedBloomPruned(
      train, eval_, "doc_id", "text", 3, fpp = 1e-7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("the corpus side of the removal anti-join never shuffles") {
    val (train, eval_) = corpus()
    val plan = Contamination.decontaminate(train, eval_, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") ||
      !plan.contains("SortMergeJoin"),
      s"flagged ids should broadcast into the anti-join:\n$plan")
  }
}
