package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** [[CorpusStats.zipfCard]] — exact-rational Zipf slope. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def card(texts: Seq[String], k: Int = 1000) = {
    import spark.implicits._
    CorpusStats.zipfCard(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), k = k)
      .collect()(0)
  }

  test("an exact count ∝ 1/rank corpus fits slope exactly -1") {
    // counts 12, 6, 4, 3 at ranks 1..4: log2f(c) = log2f(12) −
    // log2f(r) EXACTLY (log2f(2x) = log2f(x) + 2¹⁶ by construction,
    // and log2f(3)'s truncation appears identically on both axes), so
    // the four Q16 points are collinear with slope −1
    val text = Seq.fill(12)("alpha") ++ Seq.fill(6)("beta") ++
      Seq.fill(4)("gamma") ++ Seq.fill(3)("delta")
    val r = card(Seq(text.mkString(" ")))
    assert(r.getAs[Long]("n_vocab") == 4L)
    assert(r.getAs[Long]("n_tokens") == 25L)
    assert(r.getAs[Long]("slope_milli") == -1000L)
    // exact rational: num/den = -1 in Q16 terms
    assert(r.getAs[Long]("slope_num") == -r.getAs[Long]("slope_den"))
  }

  test("a flat corpus has slope zero") {
    val r = card(Seq(Seq.fill(10)("a b c d e").mkString(" ")))
    assert(r.getAs[Long]("slope_num") == 0L)
    assert(r.getAs[Long]("slope_milli") == 0L)
  }

  test("degenerate vocabularies emit zero slope, not a division error") {
    val r = card(Seq("solo solo solo"))
    assert(r.getAs[Long]("n_vocab") == 1L)
    assert(r.getAs[Long]("slope_den") == 0L)
    assert(r.getAs[Long]("slope_milli") == 0L)
  }

  test("head-only fit: k caps the regression, totals stay corpus-wide") {
    val text = Seq.fill(12)("hot") ++ Seq.fill(6)("warm") ++
      Seq.fill(4)("mild") ++ Seq.fill(3)("cool") ++ Seq("x", "y", "z")
    val r = card(Seq(text.mkString(" ")), k = 4)
    assert(r.getAs[Long]("n_fit") == 4L)
    assert(r.getAs[Long]("n_vocab") == 7L)
    assert(r.getAs[Long]("slope_milli") == -1000L)
  }

  test("heaps curve: exact growth with min-doc first-seen attribution") {
    import spark.implicits._
    // doc 3 introduces a,b; doc 5 repeats a, adds c; doc 9 adds
    // nothing new; "b" in doc 9 attributes to doc 3
    val docs = Seq(3L -> "a b a", 5L -> "a c", 9L -> "b c")
      .toDF("doc_id", "text")
    val r = CorpusStats.heapsCurve(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(r.toSeq == Seq(
      (3L, 3L, 2L, 3L, 2L), (5L, 2L, 1L, 5L, 3L), (9L, 2L, 0L, 7L, 3L)))
  }

  test("heaps curve: cumulative sums cross band boundaries correctly") {
    import spark.implicits._
    val w = 1L << 20
    // four docs straddling two doc-id bands, each adding one new token
    val docs = Seq(w - 2 -> "p q", w - 1 -> "q r", w -> "r s", w + 1 -> "s t")
      .map { case (id, t) => (id.toLong, t) }.toDF("doc_id", "text")
    val r = CorpusStats.heapsCurve(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq((2L, 2L), (4L, 3L), (6L, 4L), (8L, 5L)))
  }

  test("heaps curve is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => i -> s"tok${i % 11} tok${i % 7} fresh$i")
    val a = CorpusStats.heapsCurve(docs.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = CorpusStats.heapsCurve(docs.toDF("doc_id", "text").repartition(8))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("card is partition-invariant") {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      i -> Seq.fill((i % 7 + 1).toInt)(s"tok${i % 13}").mkString(" "))
    val a = CorpusStats.zipfCard(docs.toDF("doc_id", "text").repartition(1))
      .collect()(0).toSeq
    val b = CorpusStats.zipfCard(docs.toDF("doc_id", "text").repartition(9))
      .collect()(0).toSeq
    assert(a == b)
  }

  // ----- incremental corpus cards (tokenIndex steady-state form) -----

  // three "arrival batches" with overlapping vocabulary, out-of-order
  // doc ids across batches (first-seen must resolve to MIN doc id,
  // not arrival order), an empty doc, and a null text
  private lazy val incBatches = {
    import spark.implicits._
    Seq(
      Seq(5L -> "a b a c", 9L -> "b d", 30L -> ""),
      Seq(2L -> "a e", 17L -> "c f g", 31L -> null.asInstanceOf[String]),
      Seq(11L -> "e h a", 23L -> "h h i")
    ).map(_.toDF("doc_id", "text"))
  }
  private lazy val incFull = incBatches.reduce(_ unionByName _)

  test("tokenIndex merged per batch equals the one-shot corpus index") {
    val oneShot = CorpusStats.tokenIndex(incFull)
      .orderBy("token").collect().map(_.toSeq)
    val merged = incBatches.tail.foldLeft(
        CorpusStats.tokenIndex(incBatches.head)) { (ix, b) =>
        // localCheckpoint stands in for the persist-reload each round
        CorpusStats.tokenIndexMerge(ix.localCheckpoint(true), b)
      }
      .orderBy("token").collect().map(_.toSeq)
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("zipf card from the merged index equals the batch card") {
    val batchCard = CorpusStats.zipfCard(incFull).collect()(0).toSeq
    val merged = incBatches.tail.foldLeft(
      CorpusStats.tokenIndex(incBatches.head))(
      (ix, b) => CorpusStats.tokenIndexMerge(ix, b))
    val incCard = CorpusStats.zipfCardFromIndex(merged).collect()(0).toSeq
    assert(incCard == batchCard)
  }

  test("heaps curve from the merged index equals the batch curve") {
    val batchCurve = CorpusStats.heapsCurve(incFull)
      .orderBy("doc_id").collect().map(_.toSeq)
    val merged = incBatches.tail.foldLeft(
      CorpusStats.tokenIndex(incBatches.head))(
      (ix, b) => CorpusStats.tokenIndexMerge(ix, b))
    // docTokenCounts is append-only: each batch contributes its rows
    val counts = incBatches.map(CorpusStats.docTokenCounts(_))
      .reduce(_ unionByName _)
    val incCurve = CorpusStats.heapsCurveFromIndex(merged, counts)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(incCurve.toSeq == batchCurve.toSeq)
  }

  test("incremental cards on the sf0.001 documents table match batch") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = CorpusStats.tokenIndexMerge(
      CorpusStats.tokenIndex(half1).localCheckpoint(true), half2)
    val counts = CorpusStats.docTokenCounts(half1)
      .unionByName(CorpusStats.docTokenCounts(half2))
    assert(CorpusStats.zipfCardFromIndex(merged).collect()(0).toSeq ==
      CorpusStats.zipfCard(docs).collect()(0).toSeq)
    val inc = CorpusStats.heapsCurveFromIndex(merged, counts)
      .orderBy("doc_id").collect().map(_.toSeq)
    val batch = CorpusStats.heapsCurve(docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(inc.toSeq == batch.toSeq)
  }
}
