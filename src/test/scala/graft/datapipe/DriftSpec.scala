package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Drift.psiCard]] (q159). */
class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def card(docs: Seq[(Long, String, String)]) = {
    import spark.implicits._
    Drift.psiCard(docs.toDF("doc_id", "text", "lang")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(7), r.getLong(8)))
  }

  test("identical slices give PSI exactly 0 on every axis") {
    // doc 2i and 2i+1 are copies → ref and new distributions identical
    val docs = (0L until 40L).map { i =>
      val base = i / 2
      (i, ("w " * (1 + (base % 5).toInt * 20)).trim,
        if (base % 3 == 0) "en" else "de")
    }
    val rows = card(docs)
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rc, nc, term, psi) =>
      assert(rc == nc); assert(term == 0L); assert(psi == 0L)
    }
  }

  test("terms are non-negative (floored log2 is monotone) and a real shift scores higher") {
    val rnd = new scala.util.Random(11)
    // balanced: lengths drawn the same way for both parities
    val balanced = (0L until 60L).map { i =>
      (i, ("w " * (1 + rnd.nextInt(60))).trim, "en")
    }
    // shifted: odd docs are systematically ~4 bins longer
    val shifted = (0L until 60L).map { i =>
      val len = 1 + rnd.nextInt(30) + (if (i % 2 == 1) 70 else 0)
      (i, ("w " * len).trim, "en")
    }
    val b = card(balanced); val s = card(shifted)
    (b ++ s).foreach { case (_, _, _, _, term, _) => assert(term >= 0L) }
    val psiB = b.filter(_._1 == "len").head._6
    val psiS = s.filter(_._1 == "len").head._6
    assert(psiS > psiB,
      s"shifted corpus must score above balanced: $psiS vs $psiB")
  }

  test("KS: identical slices give 0; shift raises it; cum counts exact") {
    import spark.implicits._
    val same = (0L until 40L).map { i =>
      (i, ("w " * (1 + (i / 2).toInt % 50)).trim, "en")
    }.toDF("doc_id", "text", "lang")
    val ksSame = Drift.ksCard(same).collect()
    assert(ksSame.forall(_.getLong(6) == 0L)) // ks_num
    val shifted = (0L until 40L).map { i =>
      (i, ("w " * (1 + (i % 2).toInt * 64 + (i / 2).toInt % 8)).trim, "en")
    }.toDF("doc_id", "text", "lang")
    val ks = Drift.ksCard(shifted).collect()
    // disjoint supports → at the ref side's max value the CDF gap is
    // total: D = 1, i.e. ks_num = R·N
    assert(ks.head.getLong(6) == 20L * 20L)
    val last = ks.maxBy(_.getLong(0))
    assert(last.getLong(1) == 20L && last.getLong(2) == 20L)
  }

  test("streaming PSI snapshot equals the one-shot card") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      (i, ("w " * (1 + (i % 7).toInt * 11)).trim,
        if (i % 3 == 0) "en" else "fr")
    }
    val all = docs.toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("driftstream").toFile
    dir.deleteOnExit()
    val sd = dir.getAbsolutePath
    import graft.streaming.StreamingPipeline
    assert(StreamingPipeline.psiDriftSnapshot(spark, sd).isEmpty)
    StreamingPipeline.driftStreamInit(
      all.filter($"doc_id" % 2 === 0), sd)
    val odd = docs.filter(_._1 % 2 != 0)
    odd.grouped(10).zipWithIndex.foreach { case (b, i) =>
      StreamingPipeline.applyDriftBatch(
        b.toDF("doc_id", "text", "lang"), i, sd)
    }
    // replay the last batch: must be a no-op
    StreamingPipeline.applyDriftBatch(
      odd.takeRight(10).toDF("doc_id", "text", "lang"),
      odd.grouped(10).size - 1, sd)
    val snap = StreamingPipeline.psiDriftSnapshot(spark, sd)
    assert(snap.isDefined)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 9).map(r.get).toList).toList
    assert(rows(snap.get) ==
      rows(Drift.psiCard(all).orderBy($"axis", $"bin")))
    // the KS face shares the state machine: snapshot ≡ one-shot card
    val ksSnap = StreamingPipeline.ksDriftSnapshot(spark, sd)
    assert(ksSnap.isDefined)
    def krows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 7).map(r.get).toList).toList
    assert(krows(ksSnap.get) == krows(Drift.ksCard(all).orderBy($"n_tok")))
  }

  test("null text and null lang bin deterministically (00 / ??)") {
    val docs = Seq((0L, null: String, null: String), (1L, "", "en"),
      (2L, "a b c", null: String), (3L, "a b c", "en"))
    val rows = card(docs)
    assert(rows.exists(r => r._1 == "len" && r._2 == "00"))
    assert(rows.exists(r => r._1 == "lang" && r._2 == "??"))
  }
}
