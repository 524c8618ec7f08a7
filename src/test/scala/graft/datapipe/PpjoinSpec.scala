package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[DedupOps.ppjoinExact]] (q157): completeness is the whole point —
  * the prefix-filtered join must equal the brute-force all-pairs
  * threshold join exactly (no false negatives from the filter, no
  * false positives past verification) on generated corpora designed
  * to stress borderline Jaccard values and shared boilerplate. */
class PpjoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Brute-force mirror over the same shingle semantics. */
  def brute(docs: Seq[(String, String)], n: Int): Set[(String, String, Long, Long)] = {
    val sh = docs.collect {
      case (id, t) if t != null && t.trim.nonEmpty =>
        id -> Hashing.shingleSet(t, n)
    }.filter(_._2.nonEmpty)
    (for {
      i <- sh.indices; j <- sh.indices if i < j
      (ia, sa) = sh(i); (ib, sb) = sh(j)
      (id1, s1, id2, s2) = if (ia < ib) (ia, sa, ib, sb) else (ib, sb, ia, sa)
      (inter, union) = Hashing.jaccardCounts(s1, s2)
      if 2L * inter >= union
    } yield (id1, id2, inter.toLong, union.toLong)).toSet
  }

  def run(docs: Seq[(String, String)]): Set[(String, String, Long, Long)] = {
    import spark.implicits._
    DedupOps.ppjoinExact(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("equals brute force on a corpus with boilerplate + borderline pairs") {
    val boiler = "terms of service apply to all users of this site"
    val docs = Seq(
      "d01" -> s"alpha beta gamma delta epsilon zeta $boiler",
      "d02" -> s"alpha beta gamma delta epsilon zeta $boiler", // exact dup
      "d03" -> s"alpha beta gamma delta epsilon eta $boiler",  // near dup
      "d04" -> s"completely different text about rockets and the moon $boiler",
      "d05" -> "alpha beta gamma",                             // short
      "d06" -> "alpha beta gamma",                             // short dup
      "d07" -> "x",                                            // 1-token
      "d08" -> "",                                             // empty
      "d09" -> "unique words that share nothing with anyone at all")
    assert(run(docs) == brute(docs, 3))
  }

  test("equals brute force on seeded random corpora (phrase-mixture)") {
    val rnd = new scala.util.Random(7)
    val phrases = Vector("the quick brown fox", "jumps over the lazy dog",
      "pack my box with five dozen", "liquor jugs now", "sphinx of black quartz",
      "judge my vow today", "how vexingly quick", "daft zebras jump")
    for (trial <- 1 to 2) {
      val docs = (1 to 30).map { i =>
        val k = 2 + rnd.nextInt(4)
        f"t$i%03d" -> Seq.fill(k)(phrases(rnd.nextInt(phrases.length))).mkString(" ")
      }
      val got = run(docs)
      val want = brute(docs, 3)
      assert(got == want,
        s"trial $trial: missing=${want -- got} extra=${got -- want}")
    }
  }

  def runInc(corpus: Seq[(String, String)], batch: Seq[(String, String)]) = {
    import spark.implicits._
    DedupOps.ppjoinIncremental(corpus.toDF("doc_id", "text"),
        batch.toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("incremental equals one-shot restricted to batch-involved pairs") {
    val rnd = new scala.util.Random(19)
    val phrases = Vector("the quick brown fox", "jumps over the lazy dog",
      "pack my box with five dozen", "liquor jugs now", "sphinx of black quartz")
    val docs = (1 to 30).map { i =>
      val k = 2 + rnd.nextInt(3)
      f"t$i%03d" -> Seq.fill(k)(phrases(rnd.nextInt(phrases.length))).mkString(" ")
    }
    val (corpus, batch) = docs.partition(_._1.drop(1).toInt % 2 == 0)
    val got = runInc(corpus, batch)
    val batchIds = batch.map(_._1).toSet
    val want = brute(docs, 3)
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(got == want,
      s"missing=${want -- got} extra=${got -- want}")
  }

  test("frozen-order staleness: an all-new-shingle batch (df=0 path) stays exact") {
    // corpus and batch share NO shingles except within the batch —
    // every batch shingle takes the unseen df=0 branch of the order
    val corpus = Seq(
      "c01" -> "alpha beta gamma delta epsilon zeta eta theta",
      "c02" -> "alpha beta gamma delta epsilon zeta eta iota")
    val batch = Seq(
      "n01" -> "totally fresh vocabulary never seen before anywhere",
      "n02" -> "totally fresh vocabulary never seen before anywhere",
      "n03" -> "totally fresh vocabulary never again seen elsewhere")
    val got = runInc(corpus, batch)
    val batchIds = batch.map(_._1).toSet
    val want = brute(corpus ++ batch, 3)
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.exists(p => p._1 == "n01" && p._2 == "n02"))
  }

  test("streaming from an empty init equals the one-shot complete join") {
    import spark.implicits._
    import graft.streaming.StreamingPipeline
    val rnd = new scala.util.Random(23)
    val phrases = Vector("the quick brown fox", "jumps over the lazy dog",
      "pack my box with five dozen", "liquor jugs now", "sphinx of black quartz")
    val docs = (1 to 24).map { i =>
      val k = 2 + rnd.nextInt(3)
      f"t$i%03d" -> Seq.fill(k)(phrases(rnd.nextInt(phrases.length))).mkString(" ")
    }
    val dir = java.nio.file.Files.createTempDirectory("ppjoinstream").toFile
    dir.deleteOnExit()
    val sd = dir.getAbsolutePath
    // empty init: every shingle takes the df-0 order branch — the
    // frozen-order theorem says the result is still the exact join
    StreamingPipeline.ppjoinStreamInit(
      Seq.empty[(String, String)].toDF("doc_id", "text"), sd)
    assert(StreamingPipeline.ppjoinPairsSnapshot(spark, sd).isEmpty)
    val batches = docs.grouped(8).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyPpjoinBatch(b.toDF("doc_id", "text"), i, sd)
    }
    // replay of a committed batch is a no-op
    StreamingPipeline.applyPpjoinBatch(
      batches.last.toDF("doc_id", "text"), batches.size - 1, sd)
    val snap = StreamingPipeline.ppjoinPairsSnapshot(spark, sd)
    assert(snap.isDefined)
    val got = snap.get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == run(docs), s"streaming vs one-shot: ${got.size} pairs")
    // no pair discovered twice across batches
    assert(snap.get.count() == snap.get.distinct().count())
  }

  test("worst case (identical corpus) is output-bound, not wrong") {
    val docs = (1 to 12).map(i => f"s$i%02d" -> "same exact text in every single document here")
    val got = run(docs)
    assert(got.size == 12 * 11 / 2)
    assert(got.forall { case (_, _, i, u) => i == u })
  }
}
