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

  test("driver-side shingleSet matches the Column shingles on edge inputs") {
    import spark.implicits._
    val texts = Seq("x y z w", "a", "", "  ", "A  B\tC", "one two three four five",
      null.asInstanceOf[String])
    val viaColumn = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .filter(length(trim(col("text"))) > 0)
      .select(col("id"), Contamination.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val local = Contamination.shingleSet(t, 3)
      viaColumn.get(i.toLong) match {
        case Some(sh) => assert(local == sh, s"input ${i}: $local vs $sh")
        case None => assert(local.isEmpty, s"input ${i} filtered but local=$local")
      }
    }
  }

  test("streaming decontamination admits exactly the batch survivors") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 97 === 0)
    val batchKept = Contamination.decontaminate(train, eval_,
      "doc_id", "text", 3, minShared = 2L).collect().map(_.getLong(0)).toSet

    val rows = train.select("doc_id", "text").as[(Long, String)].collect()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = Contamination.decontaminateStream(
      input.toDS().toDF("doc_id", "text"), eval_, "text", 3, minShared = 2L)
    val query = out.writeStream.format("memory").queryName("stream_decon")
      .outputMode("append").start()
    input.addData(rows.take(100): _*)
    input.addData(rows.drop(100): _*)
    query.processAllAvailable()
    val got = spark.table("stream_decon").collect().map(_.getLong(0)).toSet
    assert(got == batchKept)
    query.stop()
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
