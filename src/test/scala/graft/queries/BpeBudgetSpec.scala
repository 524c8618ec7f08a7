package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** q94: token-budget sampling on REAL trained-BPE token counts. The
  * DuckDB oracle gate proves the cross-engine composition; this spec
  * pins the engine-side invariants a budget sampler must hold. */
class BpeBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  lazy val kept = DataPipeQueries.bpeTokenBudget(spark, sfDir).collect()
  lazy val counts = DataPipeQueries.bpeEncode(spark, sfDir)
    .select(col("doc_id"), col("n_bpe_tokens")).collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kept set is non-empty and every row carries the q90 token count") {
    assert(kept.nonEmpty)
    kept.foreach { r =>
      assert(r.getLong(2) == counts(r.getLong(0)),
        s"doc ${r.getLong(0)}: budget count differs from q90 encode count")
    }
  }

  test("per-source kept token totals never exceed the quota") {
    val bySource = kept.groupBy(_.getString(1))
      .map { case (s, rs) => s -> rs.map(_.getLong(2)).sum }
    assert(bySource.nonEmpty)
    bySource.foreach { case (s, total) =>
      val budget = s match {
        case "src0" => 3000L; case "src1" => 1000L; case _ => 2000L
      }
      assert(total <= budget, s"source $s: $total > $budget")
    }
  }

  test("kept set is a prefix of each source's hash order (monotone in quota)") {
    // shrinking every budget must select a subset of the kept set
    val docs = graft.util.Tables.documents(spark, sfDir)
    val merges = graft.datapipe.Bpe.train(
      graft.datapipe.Bpe.wordHistogram(docs, "text"), 24)
    val withCounts = docs.select(col("doc_id"), col("source"))
      .join(graft.datapipe.Bpe.encodeDocs(docs, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_bpe_tokens")), Seq("doc_id"))
    val small = graft.datapipe.Packing.tokenBudgetSample(withCounts,
        "source", "doc_id", "n_bpe_tokens",
        Map("src0" -> 1500L, "src1" -> 500L), defaultBudget = 1000L,
        salt = "bpetb")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = kept.map(_.getLong(0)).toSet
    assert(small.nonEmpty && small.subsetOf(large))
  }
}
