package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Round 18: the ONE-pass band-config sweep
  * ([[DedupOps.minhashCandidatesSweep]]) must emit, per config, exactly
  * the candidate set of the sequential per-config path
  * ([[DedupOps.minhashCandidatesFromSigs]]) — the q158 restructure is
  * an execution change only. */
class LshSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  lazy val sigs = docs
    .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
    .select(col("doc_id").as("id"),
      graft.functions.Expressions.minhash_sig_md5(
        col("text"), DedupOps.NumPerm, 3).as("sig"))
    .persist()

  test("sweep == per-config candidates for every band config") {
    val bandsList = Seq(8, 16, 32, 64)
    val sweep = DedupOps.minhashCandidatesSweep(
        sigs, DedupOps.NumPerm, bandsList)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val seq = bandsList.flatMap { b =>
      DedupOps.minhashCandidatesFromSigs(sigs, DedupOps.NumPerm, b)
        .collect().map(r => (b, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(sweep == seq)
    // and the sweep is non-degenerate at this SF: at least one config
    // produces candidates (the planted near-dup pairs)
    assert(sweep.nonEmpty)
  }

  test("sweep respects the per-config bucket cap") {
    // with maxBucket = 1 every bucket is dropped (all buckets need >= 2
    // members to pair) -> empty output for every config
    val none = DedupOps.minhashCandidatesSweep(
      sigs, DedupOps.NumPerm, Seq(8, 64), maxBucket = 1)
    assert(none.count() == 0)
  }
}
