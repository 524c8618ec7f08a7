package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Storage discipline of the base+delta streaming indexes: per-batch
  * writes are batch-sized deltas; periodic compaction folds them into
  * a bounded-file-count base. Pins (a) compacted ≡ uncompacted ≡
  * one-shot batch results, (b) the file-count bound after N
  * micro-batches, (c) replay idempotence across the compaction
  * batch's crash windows.
  */
class CompactionStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ls(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty else f.listFiles().map(_.getName).toSeq
  }

  test("token index: 12 batches at compactEvery=4 — cards equal one-shot, delta count bounded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tokenix_compact").toString
    val state = s"$dir/state"
    val batches = (0 until 12).map { b =>
      (0 until 5).map { r =>
        val id = (b * 5 + r).toLong
        (id, s"w${id % 7} w${id % 3} shared t$b")
      }
    }
    batches.zipWithIndex.foreach { case (rows, b) =>
      StreamingPipeline.applyTokenIndexBatch(
        rows.toDF("doc_id", "text"), b.toLong, state, "doc_id", "text",
        compactEvery = 4)
    }
    // live cards == one-shot batch cards of the union corpus
    val all = batches.flatten.toDF("doc_id", "text")
    val (zipf, heaps) = StreamingPipeline.corpusCardsSnapshot(spark, state).get
    assert(zipf.collect()(0).toSeq ==
      graft.datapipe.CorpusStats.zipfCard(all).collect()(0).toSeq)
    assert(heaps.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      graft.datapipe.CorpusStats.heapsCurve(all)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq)
    // compactions ran at batches 0, 4, 8 → only deltas 9..11 remain,
    // and the GC'd base keeps at most the current + previous version
    val deltas = ls(s"$state/index_delta").filter(_.startsWith("batch_id="))
    assert(deltas.toSet == Set("batch_id=9", "batch_id=10", "batch_id=11"),
      deltas)
    val bases = ls(s"$state/index").filter(_.startsWith("v"))
    assert(bases.size <= 2, bases)
    assert(bases.contains("v8"), bases)
    // the append-only counts relation compacts under the same cycle
    val countDeltas = ls(s"$state/counts").filter(_.startsWith("batch_id="))
    assert(countDeltas.toSet ==
      Set("batch_id=9", "batch_id=10", "batch_id=11"), countDeltas)
    assert(ls(s"$state/counts_base").count(_.startsWith("v")) <= 2)
  }

  test("token index: compaction-batch replay across every crash window changes nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tokenix_replay2").toString
    val state = s"$dir/state"
    def b(i: Int) = Seq((i.toLong, s"a b c$i")).toDF("doc_id", "text")
    for (i <- 0 until 4)
      StreamingPipeline.applyTokenIndexBatch(b(i), i.toLong, state,
        "doc_id", "text", compactEvery = 4)
    def curve() = StreamingPipeline.corpusCardsSnapshot(spark, state).get
      ._2.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val before = curve()
    // batch 3 did NOT compact (3 - 0 < 4); batch 4 does. Replay batch 4
    // after it fully committed: the delta rewrite resurrects an
    // absorbed partition (id ≤ base → ignored) and the manifest at v4
    // suppresses a second fold — counts must not double.
    StreamingPipeline.applyTokenIndexBatch(b(4), 4L, state,
      "doc_id", "text", compactEvery = 4)
    val afterCompact = curve()
    StreamingPipeline.applyTokenIndexBatch(b(4), 4L, state,
      "doc_id", "text", compactEvery = 4)
    assert(curve() == afterCompact)
    assert(afterCompact.size == before.size + 1)
    // and the stream continues normally
    StreamingPipeline.applyTokenIndexBatch(b(5), 5L, state,
      "doc_id", "text", compactEvery = 4)
    assert(curve().size == before.size + 2)
  }

  test("near-dup stream: compaction preserves suppression across the base boundary, bounded dirs") {
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("neardup_compact").toString
    val dirB = java.nio.file.Files.createTempDirectory("neardup_plain").toString
    def words(seed: Int, n: Int) = (0 until n).map(i => s"w${seed * 100 + i}")
    // 10 batches of distinct docs; batch 9 near-dups batch 0's doc
    // (absorbed into the base by then) and must still be suppressed
    val batches = (0 until 9).map { bi =>
      Seq(((bi + 1).toLong, words(bi + 1, 40).mkString(" ")))
    } :+ Seq(
      (100L, (words(1, 36) ++ words(50, 4)).mkString(" ")), // dup of doc 1
      (101L, words(60, 40).mkString(" ")))                   // novel
    batches.zipWithIndex.foreach { case (rows, bi) =>
      StreamingPipeline.applyNearDupBatch(rows.toDF("doc_id", "text"),
        bi.toLong, dirA, "doc_id", "text", 0.5, compactEvery = 4)
      StreamingPipeline.applyNearDupBatch(rows.toDF("doc_id", "text"),
        bi.toLong, dirB, "doc_id", "text", 0.5, compactEvery = 1000000)
    }
    def novel(d: String) = spark.read.parquet(s"$d/novel")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel(dirA) == novel(dirB))
    assert(!novel(dirA).contains(100L) && novel(dirA).contains(101L))
    // compactions at 0, 4, 8 → only delta 9 remains in the compacted
    // state; the uncompacted twin keeps one dir per batch after 0
    val deltas = ls(s"$dirA/postings").filter(_.startsWith("batch_id="))
    assert(deltas.toSet == Set("batch_id=9"), deltas)
    assert(ls(s"$dirA/postings_base").count(_.startsWith("v")) <= 2)
    assert(ls(s"$dirA/texts_base").count(_.startsWith("v")) <= 2)
    assert(ls(s"$dirB/postings").count(_.startsWith("batch_id=")) == 9)
  }

  test("ANN index: compacted probe equals uncompacted probe and the delta count is bounded") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = graft.util.Tables.embeddings(spark, sf)
    val dirA = java.nio.file.Files.createTempDirectory("ann_compact").toString
    val dirB = java.nio.file.Files.createTempDirectory("ann_plain").toString
    // 9 batches by vec_id band; batch 0 trains the quantizer in BOTH
    // states (identical deterministic training → identical model)
    for (b <- 0 until 9) {
      val part = emb.filter(pmod(col("vec_id"), lit(9)) === b)
      StreamingPipeline.applyAnnIndexBatch(part, b.toLong, s"$dirA/state",
        8, 3, "vec_id", "embedding", compactEvery = 4)
      StreamingPipeline.applyAnnIndexBatch(part, b.toLong, s"$dirB/state",
        8, 3, "vec_id", "embedding", compactEvery = 1000000)
    }
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq
    def probe(state: String) =
      StreamingPipeline.annIndexSnapshot(spark, state, queries)
        .get.collect().map(_.toSeq).toSeq
    assert(probe(s"$dirA/state") == probe(s"$dirB/state"))
    // compactions at 0, 4, 8 → deltas ≤ compactEvery−1 remain; the
    // uncompacted twin still carries one dir per batch
    val deltasA = ls(s"$dirA/state/assign").filter(_.startsWith("batch_id="))
    assert(deltasA.isEmpty, deltasA) // batch 8 compacted everything
    assert(ls(s"$dirA/state/assign_base").count(_.startsWith("v")) <= 2)
    // (batch 0 always compacts so a base exists → the twin carries
    // one delta dir per batch AFTER batch 0)
    assert(ls(s"$dirB/state/assign")
      .count(_.startsWith("batch_id=")) == 8)
    // replay of the compaction batch: identical probe, no double rows
    StreamingPipeline.applyAnnIndexBatch(
      emb.filter(pmod(col("vec_id"), lit(9)) === 8), 8L, s"$dirA/state",
      8, 3, "vec_id", "embedding", compactEvery = 4)
    assert(probe(s"$dirA/state") == probe(s"$dirB/state"))
    val total = spark.read.parquet(
      s"$dirA/state/assign_base/v8").count()
    assert(total == emb.count(), s"base rows $total")
  }
}
