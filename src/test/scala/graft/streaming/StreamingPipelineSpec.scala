package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.Publication
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming heavy hitters: sharded MG state persists and stays bounded") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val k = 8
    val input = MemoryStream[String]
    val out = StreamingPipeline.heavyHittersStream(spark, input.toDS(), k, nShards = 4)
    val query = out.toDF("shard", "term", "mg_count").writeStream
      .format("memory").queryName("stream_hh")
      .outputMode("update").start()

    // batch 1: "hot" dominates among many one-off fillers
    input.addData(Seq.fill(30)("hot") ++ (1 to 40).map(i => s"f$i"): _*)
    query.processAllAvailable()
    val b1 = spark.table("stream_hh").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val hot1 = b1.filter(_._2 == "hot").map(_._3).max
    // MG bound even if every item hashed to hot's shard: 30 - 70/(k+1)
    assert(hot1 >= 30 - 70 / (k + 1), b1.mkString(","))
    // batch 2: more hot arrivals accumulate into the SAME shard state
    input.addData(Seq.fill(25)("hot") ++ (41 to 60).map(i => s"f$i"): _*)
    query.processAllAvailable()
    val b2 = spark.table("stream_hh").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val hot2 = b2.filter(_._2 == "hot").map(_._3).max
    assert(hot2 > hot1, s"$hot1 -> $hot2") // state carried across batches
    // every emission respects the per-shard bound: ≤ k terms per
    // (shard, trigger) — O(nShards·k) state, vocabulary-independent
    val perShard = b2.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map(_._2).distinct.size }
    assert(perShard.values.forall(_ <= 2 * k), perShard.toString)
    // a term's history lives in exactly one shard
    assert(b2.filter(_._2 == "hot").map(_._1).distinct.length == 1)
    query.stop()
  }

  test("streaming token-budget admission mirrors the batch strict-prefix rule") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val out = StreamingPipeline.tokenBudgetStream(
      input.toDS().toDF("doc_id", "source", "n_tokens"),
      budgets = Map("a" -> 100L), defaultBudget = 50L)
    val query = out.toDF("doc_id", "source", "n_tokens").writeStream
      .format("memory").queryName("stream_budget")
      .outputMode("update").start()

    // batch 1: source a admits 40+50 (cum 90 ≤ 100); the 20-token doc
    // crosses the quota (cum 110) and is rejected
    input.addData((1L, "a", 40L), (2L, "a", 50L), (3L, "a", 20L),
      (10L, "b", 45L))
    query.processAllAvailable()
    val b1 = spark.table("stream_budget").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(b1 == Set((1L, "a"), (2L, "a"), (10L, "b")))

    // batch 2: rejected mass accrued — a 5-token doc that WOULD fit
    // the remaining 10 is still rejected (cum already 110); source b
    // crosses its default quota (45 + 10 > 50) and rejects too
    input.addData((4L, "a", 5L), (11L, "b", 10L))
    query.processAllAvailable()
    val b2 = spark.table("stream_budget").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(b2 == b1, s"expected no new admissions, got ${b2 -- b1}")
    query.stop()
  }

  test("streaming cluster scoring equals the batch assignment under the trained model") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val emb = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = graft.datapipe.Clustering.kmeansCentroids(emb, k = 4, iters = 2)
    val batchExpected = graft.datapipe.Clustering
      .assignWithCentroids(emb, centroids).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().take(50)
    val input = MemoryStream[(Long, Seq[Float])]
    val out = StreamingPipeline.clusterAssignStream(
      input.toDS().toDF("vec_id", "embedding"), centroids)
    val query = out.writeStream.format("memory").queryName("stream_cluster")
      .outputMode("append").start()
    input.addData(rows.take(20): _*)
    input.addData(rows.drop(20): _*)
    query.processAllAvailable()
    val got = spark.table("stream_cluster").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 50)
    got.foreach { case (id, a) => assert(a == batchExpected(id), s"vec $id") }
    query.stop()
  }

  test("streaming LM scoring against the batch-trained model equals batch lmScore") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val model = graft.datapipe.QualityScore.lmGramProbs(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchExpected = graft.datapipe.QualityScore.lmScore(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.lmScoreStream(
      input.toDS().toDF("doc_id", "text"), model)
    val query = out.writeStream.format("memory").queryName("stream_lm")
      .outputMode("append").start()
    input.addData(rows.take(30): _*)
    input.addData(rows.drop(30): _*)
    query.processAllAvailable()
    val got = spark.table("stream_lm").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 60)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming text featurization equals the batch projection") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val batchExpected = graft.datapipe.Featurize
      .embedDocuments(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.featurizeStream(
      input.toDS().toDF("doc_id", "text"))
    val query = out.writeStream.format("memory").queryName("stream_feat")
      .outputMode("append").start()
    input.addData(rows.take(30): _*)
    input.addData(rows.drop(30): _*)
    query.processAllAvailable()
    val got = spark.table("stream_feat").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.size == 60)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming DSIR scoring equals the batch importance weights") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
    val target = docs.filter(col("source") === "src0")
    val B = 4096
    val batchExpected = graft.datapipe.Importance
      .importanceWeights(docs, target, buckets = B).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (model, norm) = graft.datapipe.Importance
      .importanceModelCollected(docs, target, buckets = B)

    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.dsirScoreStream(
      input.toDS().toDF("doc_id", "text"), model, norm, B)
    val query = out.writeStream.format("memory").queryName("stream_dsir")
      .outputMode("append").start()
    input.addData(rows.take(30): _*)
    input.addData(rows.drop(30): _*)
    query.processAllAvailable()
    val got = spark.table("stream_dsir").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 60)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming repetition and entropy gates equal the batch operators") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val repExpected = graft.datapipe.QualityScore
      .repetitionCharMetrics(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val entExpected = graft.datapipe.QualityScore
      .charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val rep = StreamingPipeline.repetitionCharsStream(
      input.toDS().toDF("doc_id", "text"))
    val q1 = rep.writeStream.format("memory").queryName("stream_rep")
      .outputMode("append").start()
    val input2 = MemoryStream[(Long, String)]
    val ent = StreamingPipeline.charEntropyStream(
      input2.toDS().toDF("doc_id", "text"))
    val q2 = ent.writeStream.format("memory").queryName("stream_ent")
      .outputMode("append").start()
    input.addData(rows: _*)
    input2.addData(rows: _*)
    q1.processAllAvailable()
    q2.processAllAvailable()
    val gotRep = spark.table("stream_rep").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val gotEnt = spark.table("stream_ent").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotRep.size == 60 && gotEnt.size == 60)
    gotRep.foreach { case (id, v) => assert(v == repExpected(id), s"rep $id") }
    gotEnt.foreach { case (id, v) => assert(v == entExpected(id), s"ent $id") }
    q1.stop(); q2.stop()
  }

  test("streaming backoff-LM scoring equals the batch cross-split scorer") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val batchExpected = graft.datapipe.QualityScore
      .backoffLmScore(docs, ref).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val (c3, c2, c1, n) = graft.datapipe.QualityScore
      .backoffLmModelCollected(ref)

    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.backoffLmScoreStream(
      input.toDS().toDF("doc_id", "text"), c3, c2, c1, n)
    val query = out.writeStream.format("memory").queryName("stream_bolm")
      .outputMode("append").start()
    input.addData(rows: _*)
    query.processAllAvailable()
    val got = spark.table("stream_bolm").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got.size == 60)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming sentence scrub equals the batch index-removal rule") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = Seq(900L -> "Known banner one. Known banner two. Archive.")
      .toDF("doc_id", "text")
    val idx = graft.datapipe.Spans.sentenceIndex(corpus, "doc_id", "text")
    val idxSet = idx.select("h").as[String].collect().toSet
    // batch docs with NO internal duplicates (the twin's honest scope)
    val rows = Seq(
      (1L, "Known banner one. Fresh alpha content."),
      (2L, "Fresh beta content. Known banner two! More beta."),
      (3L, "Entirely fresh."), (4L, ""))
    val batchExpected = graft.datapipe.Spans.sentenceDedupIncremental(
        rows.toDF("doc_id", "text"), idx, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getString(5)))).toMap
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.sentenceScrubStream(
      input.toDS().toDF("doc_id", "text"), idxSet)
    val query = out.writeStream.format("memory").queryName("stream_scrub")
      .outputMode("append").start()
    input.addData(rows: _*)
    query.processAllAvailable()
    val got = spark.table("stream_scrub").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.size == 4)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming span corruption equals the batch denoising pairs") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val batchExpected = graft.datapipe.Corruption
      .spanCorrupt(docs, rate = 0.15, salt = "cor0").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.spanCorruptStream(
      input.toDS().toDF("doc_id", "text"), rate = 0.15, salt = "cor0")
    val query = out.writeStream.format("memory").queryName("stream_corrupt")
      .outputMode("append").start()
    input.addData(rows: _*)
    query.processAllAvailable()
    val got = spark.table("stream_corrupt").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got.size == 60)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming PII redaction equals the batch scrub") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Seq(
      (1L, "mail a@b.co or visit 10.0.0.7"),
      (2L, "call +123456789 re 123-45-6789"),
      (3L, "nothing sensitive")).toDF("doc_id", "text")
    val batchExpected = graft.datapipe.Pii.redact(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.piiRedactStream(
      input.toDS().toDF("doc_id", "text"))
    val query = out.writeStream.format("memory").queryName("stream_pii")
      .outputMode("append").start()
    input.addData((1L, "mail a@b.co or visit 10.0.0.7"),
      (2L, "call +123456789 re 123-45-6789"), (3L, "nothing sensitive"))
    query.processAllAvailable()
    val got = spark.table("stream_pii").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got.size == 3)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming sliding-window chunking equals the batch chunking") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val batchExpected = graft.datapipe.Packing
      .chunkDocuments(docs, chunkTokens = 16, stride = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.chunkStream(
      input.toDS().toDF("doc_id", "text"), chunkTokens = 16, stride = 12)
    val query = out.writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    input.addData(rows.take(30): _*)
    input.addData(rows.drop(30): _*)
    query.processAllAvailable()
    val got = spark.table("stream_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val expectedSubset = batchExpected.filter {
      case ((id, _), _) => rows.exists(_._1 == id)
    }
    assert(got.nonEmpty && got == expectedSubset)
    query.stop()
  }

  test("streaming Gopher rule battery equals the batch battery") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val batchExpected = graft.datapipe.QualityScore.gopherRules(docs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap

    val rows = docs.as[(Long, String)].collect().take(60)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPipeline.gopherRulesStream(
      input.toDS().toDF("doc_id", "text"))
    val query = out.writeStream.format("memory").queryName("stream_gopher")
      .outputMode("append").start()
    input.addData(rows.take(30): _*)
    input.addData(rows.drop(30): _*)
    query.processAllAvailable()
    val got = spark.table("stream_gopher").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.size == 60)
    got.foreach { case (id, v) => assert(v == batchExpected(id), s"doc $id") }
    query.stop()
  }

  test("streaming int8 quantization and PCA projection equal the batch ops") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // batch-fitted model (the offline half)
    val (mean, cov) = graft.datapipe.Embeddings.meanCovariance(emb, "embedding", 64)
    val basis = graft.datapipe.Embeddings.topEigenvectors(cov, 8)
    val batchQuant = graft.datapipe.Embeddings.int8Quantize(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val batchProj = graft.datapipe.Embeddings
      .project(emb, "embedding", "pca", mean, basis).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap

    val rows = emb.as[(Long, Seq[Float])].collect().take(40)
      .map { case (id, v) => (id, v.toArray) }
    val input = MemoryStream[(Long, Array[Float])]
    val df = input.toDS().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val q1 = StreamingPipeline.int8QuantizeStream(df)
      .writeStream.format("memory").queryName("stream_i8")
      .outputMode("append").start()
    val q2 = StreamingPipeline.pcaProjectStream(df, mean, basis)
      .writeStream.format("memory").queryName("stream_pca")
      .outputMode("append").start()
    input.addData(rows.take(20): _*)
    input.addData(rows.drop(20): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    val gotQuant = spark.table("stream_i8").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val gotProj = spark.table("stream_pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(gotQuant.size == 40 && gotProj.size == 40)
    gotQuant.foreach { case (id, v) => assert(v == batchQuant(id), s"vec $id") }
    gotProj.foreach { case (id, v) => assert(v == batchProj(id), s"vec $id") }
    q1.stop(); q2.stop()
  }

  test("streaming latest-version with tombstones via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Publication]
    val out = StreamingPipeline.latestVersionStream(spark, input.toDS())
    val query = out.writeStream
      .format("memory").queryName("latest_pubs")
      .outputMode("append").start()

    // batch 1: baseline versions
    input.addData(
      Publication(pub_id = "1", title = Some("v1"), filename = "pubmed19n0001.xml.gz"),
      Publication(pub_id = "2", title = Some("x"), filename = "pubmed19n0001.xml.gz"))
    query.processAllAvailable()
    // batch 2: update revises pub 1, tombstones pub 2
    input.addData(
      Publication(pub_id = "1", title = Some("v2"), filename = "pubmed19n1201.xml.gz"),
      Publication(pub_id = "2", filename = "pubmed19n1201.xml.gz", is_deleted = true))
    query.processAllAvailable()
    // batch 3: stale older file must NOT downgrade pub 1
    input.addData(
      Publication(pub_id = "1", title = Some("v0"), filename = "pubmed19n0000.xml.gz"))
    query.processAllAvailable()

    val rows = spark.table("latest_pubs")
      .select("pub_id", "title", "filename").collect()
    val byPub = rows.groupBy(_.getString(0))
    // pub 1: emitted v1 then v2, never v0
    assert(byPub("1").map(_.getString(1)).toSet == Set("v1", "v2"))
    // pub 2: emitted once (x), tombstone emitted nothing after
    assert(byPub("2").map(_.getString(1)).toSet == Set("x"))
    query.stop()
  }

  test("watermarked windowed event aggregation") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamingPipeline.eventsWindowed(events, "10 minutes", "1 hour")
    val query = out.writeStream
      .format("memory").queryName("windowed_events")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "view", 5.0))
    query.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    input.addData((ts("2024-01-01 13:00:00"), "click", 1.0))
    query.processAllAvailable()

    val rows = spark.table("windowed_events").collect()
    val clickHour10 = rows.find(r =>
      r.getAs[java.sql.Timestamp]("window_start").toString.startsWith("2024-01-01 10:00") &&
        r.getAs[String]("event_type") == "click")
    assert(clickHour10.isDefined, rows.toSeq)
    assert(clickHour10.get.getAs[Long]("n") == 2)
    assert(clickHour10.get.getAs[Double]("total_value") == 3.0)
    query.stop()
  }

  test("streaming exact dedup by content hash within watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingPipeline.dedupStream(docs, "ts", "text", "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("dedup_docs")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2024-01-01 10:00:00"), 1L, "alpha beta"),
      (ts("2024-01-01 10:00:30"), 2L, "gamma delta"))
    query.processAllAvailable()
    // duplicate content inside the watermark horizon: suppressed
    input.addData(
      (ts("2024-01-01 10:01:00"), 3L, "alpha beta"),
      (ts("2024-01-01 10:02:00"), 4L, "epsilon"))
    query.processAllAvailable()

    val ids = spark.table("dedup_docs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), s"got $ids")
    query.stop()
  }

  test("session_window streaming sessionization (batch twin: Sessionize)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val out = StreamingPipeline.eventsSessionized(events, "5 minutes", "30 minutes")
    val query = out.writeStream
      .format("memory").queryName("sessionized_events")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events 10 min apart (one session), then a 40-min gap
    // event (second session); user 2: one event
    input.addData(
      (ts("2024-01-01 10:00:00"), 1L),
      (ts("2024-01-01 10:10:00"), 1L),
      (ts("2024-01-01 10:50:00"), 1L),
      (ts("2024-01-01 10:05:00"), 2L))
    query.processAllAvailable()
    // advance event time so the watermark closes every session
    input.addData((ts("2024-01-01 14:00:00"), 9L))
    query.processAllAvailable()

    val rows = spark.table("sessionized_events")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(rows.contains((1L, "2024-01-01 10:00:00.0", 2L)), rows)
    assert(rows.contains((1L, "2024-01-01 10:50:00.0", 1L)), rows)
    assert(rows.contains((2L, "2024-01-01 10:05:00.0", 1L)), rows)
    query.stop()
  }

  test("foreachBatch CDC upsert stream maintains a merged snapshot") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert_stream").toString
    val snap = s"$dir/snapshot"
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val delta = input.toDF().toDF("id", "v", "version", "is_deleted")
    val query = StreamingPipeline.upsertStream(delta, snap,
        Seq("id"), "version", "is_deleted")
      .option("checkpointLocation", s"$dir/ckpt").start()

    // batch 1 bootstraps the snapshot
    input.addData((1L, "a", 1L, false), (2L, "b", 1L, false))
    query.processAllAvailable()
    def state() = StreamingPipeline.snapshot(spark, snap).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state() == Set((1L, "a"), (2L, "b")))

    // batch 2: revise 1, tombstone 2, insert 3
    input.addData((1L, "a2", 2L, false), (2L, "b", 2L, true), (3L, "c", 1L, false))
    query.processAllAvailable()
    assert(state() == Set((1L, "a2"), (3L, "c")))

    // batch 3: stale version for 1 must not downgrade the snapshot,
    // and a late stale upsert for DELETED key 2 must not resurrect it
    // (the retained tombstone at v2 out-versions the stale v1 row —
    // this is why the snapshot keeps tombstones across batches)
    input.addData((1L, "a0", 1L, false), (2L, "b0", 1L, false))
    query.processAllAvailable()
    assert(state() == Set((1L, "a2"), (3L, "c")))
    query.stop()
  }

  test("upsert batch replay across the flip-then-crash window recovers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_replay").toString
    val snap = s"$dir/snapshot"
    def delta(rows: (Long, String, Long, Boolean)*) =
      rows.toDF("id", "v", "version", "is_deleted")
    def state() = StreamingPipeline.snapshot(spark, snap).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    StreamingPipeline.applyUpsertBatch(delta((1L, "a", 1L, false)), 0L,
      snap, Seq("id"), "version", "is_deleted")
    StreamingPipeline.applyUpsertBatch(delta((2L, "b", 1L, false)), 1L,
      snap, Seq("id"), "version", "is_deleted")
    assert(state() == Set((1L, "a"), (2L, "b")))

    // crash window: _LATEST already points at v1, but the stream
    // checkpoint never committed — restart re-delivers batch 1. The
    // base would be read from v1 and overwritten in place, which Spark
    // refuses; recovery = skip the rewrite (idempotent) and re-flip.
    StreamingPipeline.applyUpsertBatch(delta((2L, "b", 1L, false)), 1L,
      snap, Seq("id"), "version", "is_deleted")
    assert(state() == Set((1L, "a"), (2L, "b")))

    // a stray dir named exactly "v" must not break cleanup
    new java.io.File(s"$snap/v").mkdirs()
    StreamingPipeline.applyUpsertBatch(delta((3L, "c", 1L, false)), 2L,
      snap, Seq("id"), "version", "is_deleted")
    assert(state() == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // the stream still makes progress after the replayed batch
    StreamingPipeline.applyUpsertBatch(delta((1L, "a2", 2L, false)), 3L,
      snap, Seq("id"), "version", "is_deleted")
    assert(state() == Set((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("streaming near-dup dedup: cross-batch suppression via the postings index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    def words(seed: Int, n: Int) =
      (0 until n).map(i => s"w${seed * 100 + i}")
    // batch 0: two distinct docs
    val docA = words(1, 40).mkString(" ")
    val docB = words(2, 40).mkString(" ")
    val b0 = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    StreamingPipeline.applyNearDupBatch(b0, 0L, dir, "doc_id", "text", 0.5)
    val novel0 = spark.read.parquet(s"$dir/novel").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(novel0 == Set(1L, 2L))

    // batch 1: A' near-dups corpus doc A at the borderline (28/40
    // shared tokens, J = 26/50 = 0.52; this fixed pair shares 4 of 32
    // band keys — deterministically caught) -> suppressed even though
    // its id 10 is smaller than nothing in the corpus matters: the
    // already-accepted doc wins. C and D near-dup EACH OTHER strongly
    // (36/40 shared tokens, J = 34/42 ≈ 0.81) -> min id (30) survives.
    // E is novel.
    val docA2 = (words(1, 28) ++ words(9, 12)).mkString(" ")
    val docC = words(3, 40).mkString(" ")
    val docD = (words(3, 36) ++ words(8, 4)).mkString(" ")
    val docE = words(4, 40).mkString(" ")
    val b1 = Seq((10L, docA2), (30L, docC), (31L, docD), (40L, docE))
      .toDF("doc_id", "text")
    StreamingPipeline.applyNearDupBatch(b1, 1L, dir, "doc_id", "text", 0.5)
    val novel1 = spark.read.parquet(s"$dir/novel")
      .filter(col("batch_id") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(novel1 == Set(30L, 40L), novel1)

    // suppressed docs never entered the index: a near-dup of D (which
    // was suppressed) that is NOT a near-dup of C still passes
    // replay of committed batch 1 is a no-op (idempotence)
    StreamingPipeline.applyNearDupBatch(b1, 1L, dir, "doc_id", "text", 0.5)
    assert(spark.read.parquet(s"$dir/novel").filter(col("batch_id") === 1)
      .count() == 2)

    // batch 2: a strong near-dup of surviving C is suppressed; a fresh
    // doc is not
    val docC2 = (words(3, 36) ++ words(7, 4)).mkString(" ")
    val b2 = Seq((50L, docC2), (60L, words(5, 40).mkString(" ")))
      .toDF("doc_id", "text")
    StreamingPipeline.applyNearDupBatch(b2, 2L, dir, "doc_id", "text", 0.5)
    val novel2 = spark.read.parquet(s"$dir/novel")
      .filter(col("batch_id") === 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(novel2 == Set(60L), novel2)

    // crash recovery: a batch-3 attempt that died mid-write left a
    // TRUNCATED parquet part-file in its uncommitted postings/texts
    // dirs (no novel/_SUCCESS) — replay must clear them, not choke on
    // the root read
    for (sub <- Seq("postings", "texts")) {
      val stale = java.nio.file.Paths.get(dir, sub, "batch_id=3")
      java.nio.file.Files.createDirectories(stale)
      java.nio.file.Files.write(stale.resolve("part-00000.snappy.parquet"),
        Array[Byte]('P', 'A', 'R', '1', 0x13, 0x37))
    }
    val b3 = Seq((70L, words(6, 40).mkString(" "))).toDF("doc_id", "text")
    StreamingPipeline.applyNearDupBatch(b3, 3L, dir, "doc_id", "text", 0.5)
    val novel3 = spark.read.parquet(s"$dir/novel")
      .filter(col("batch_id") === 3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(novel3 == Set(70L), novel3)
  }

  test("stream-stream interval join attributes conversions to recent clicks") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val convs = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val out = StreamingPipeline.intervalJoinStreams(
      clicks.toDF().toDF("ts", "user_id", "page"),
      convs.toDF().toDF("rts", "user_id", "amount"),
      "user_id", horizon = "1 hour", watermark = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("attributed")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    clicks.addData(
      (ts("2024-01-01 10:00:00"), 1L, "a"),   // within 1h of conv -> joins
      (ts("2024-01-01 10:40:00"), 1L, "b"),   // within 1h -> joins
      (ts("2024-01-01 08:00:00"), 1L, "old"), // > 1h before conv -> no
      (ts("2024-01-01 10:30:00"), 2L, "c"))   // other user, no conversion
    convs.addData((ts("2024-01-01 10:45:00"), 1L, 9.99))
    query.processAllAvailable()
    // advance both watermarks so buffered state can be evicted
    // (distinct keys so the advancing rows don't join each other)
    clicks.addData((ts("2024-01-01 14:00:00"), 8L, "z"))
    convs.addData((ts("2024-01-01 14:00:00"), 9L, 0.0))
    query.processAllAvailable()

    val rows = spark.table("attributed")
      .select("user_id", "page", "amount").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "a", 9.99), (1L, "b", 9.99)), rows)
    query.stop()
  }

  test("streaming token index serves live corpus cards equal to batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("tokenix_stream").toString
    val state = s"$dir/state"
    val input = MemoryStream[(Long, String)]
    val query = StreamingPipeline.tokenIndexStream(
        input.toDF().toDF("doc_id", "text"), state)
      .option("checkpointLocation", s"$dir/ckpt").start()

    assert(StreamingPipeline.corpusCardsSnapshot(spark, state).isEmpty)
    // out-of-order doc ids across batches: first-seen must resolve to
    // MIN doc id, not arrival order
    val b1 = Seq(5L -> "a b a c", 9L -> "b d", 30L -> "")
    val b2 = Seq(2L -> "a e", 17L -> "c f g")
    val b3 = Seq(11L -> "e h a", 23L -> "h h i")
    input.addData(b1: _*); query.processAllAvailable()
    input.addData(b2: _*); query.processAllAvailable()
    input.addData(b3: _*); query.processAllAvailable()
    query.stop()

    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val (zipf, heaps) = StreamingPipeline.corpusCardsSnapshot(spark, state).get
    assert(zipf.collect()(0).toSeq ==
      graft.datapipe.CorpusStats.zipfCard(all).collect()(0).toSeq)
    assert(heaps.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      graft.datapipe.CorpusStats.heapsCurve(all)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("streaming PCA moments serve a live eigenvector equal to the batch fit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("moments_stream").toString
    val state = s"$dir/state"
    val d = 8
    def vec(r: Int): Seq[Float] = {
      val base = ((r * 2654435761L) % 1000).toFloat / 500f - 1f
      Seq.tabulate(d) { i =>
        val noise = (((r * 48271L + i * 7919L) % 997).toFloat / 997f - 0.5f) * 0.1f
        if (i == 0) base + noise else if (i == 1) 0.8f * base + noise else noise
      }
    }
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamingPipeline.momentsStream(
        input.toDF().toDF("vec_id", "embedding"), state, d)
      .option("checkpointLocation", s"$dir/ckpt").start()

    assert(StreamingPipeline.pcaSnapshot(spark, state, d).isEmpty)
    val b1 = (1 to 40).map(r => (r.toLong, vec(r)))
    val b2 = (41 to 90).map(r => (r.toLong, vec(r)))
    input.addData(b1: _*); query.processAllAvailable()
    val mid = StreamingPipeline.pcaSnapshot(spark, state, d).get
      .orderBy("slot").collect().map(_.getLong(1))
    input.addData(b2: _*); query.processAllAvailable()
    query.stop()

    // live snapshot == one-shot fit of everything ingested, bit-for-bit
    val all = (b1 ++ b2).map(_._2)
    val m = all.toDF("vec").select(col("vec")).as[Seq[Float]]
      .select(new graft.datapipe.Embeddings.MomentsAgg(d).toColumn.name("m"))
      .head()
    val (v, lam) = graft.datapipe.Embeddings.powerIterationFixed(m, d, 64)
    val got = StreamingPipeline.pcaSnapshot(spark, state, d).get
      .orderBy("slot").collect().map(_.getLong(1))
    assert(got.toSeq == (v.map(_.toLong) :+ lam.toLong).toSeq)
    // and the mid-stream snapshot was the fit of batch 1 alone
    val m1 = b1.map(_._2).toDF("vec").select(col("vec")).as[Seq[Float]]
      .select(new graft.datapipe.Embeddings.MomentsAgg(d).toColumn.name("m"))
      .head()
    val (v1, lam1) = graft.datapipe.Embeddings.powerIterationFixed(m1, d, 64)
    assert(mid.toSeq == (v1.map(_.toLong) :+ lam1.toLong).toSeq)
  }

  test("streaming ANN index: live probe equals the q139 batch result, replay-safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ann_stream").toString
    val state = s"$dir/state"
    val sf = "/root/testdata/sf0.001"
    val emb = graft.util.Tables.embeddings(spark, sf)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    // an empty first micro-batch (routine at stream start) must not
    // train a degenerate 0-centroid model — no model, no snapshot yet
    StreamingPipeline.applyAnnIndexBatch(even.limit(0), 0L, state, 8, 3,
      "vec_id", "embedding")
    assert(StreamingPipeline.annIndexSnapshot(spark, state, Seq.empty).isEmpty)
    // batch 0 trains the quantizer (= q139's training batch), batch 1 appends
    StreamingPipeline.applyAnnIndexBatch(even, 0L, state, 8, 3, "vec_id", "embedding")
    StreamingPipeline.applyAnnIndexBatch(odd, 1L, state, 8, 3, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq
    def snap() = StreamingPipeline.annIndexSnapshot(spark, state, queries)
      .get.collect().map(_.toSeq).toSeq
    val expected = graft.queries.DataPipeQueries.annIndexInc(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(snap() == expected)
    // crash-replay of batch 1: overwrite-idempotent, model untouched
    val modelBefore = spark.read.parquet(s"$state/models/v0")
      .orderBy("cl").collect().map(_.toSeq).toSeq
    StreamingPipeline.applyAnnIndexBatch(odd, 1L, state, 8, 3, "vec_id", "embedding")
    assert(snap() == expected)
    val modelAfter = spark.read.parquet(s"$state/models/v0")
      .orderBy("cl").collect().map(_.toSeq).toSeq
    assert(modelBefore == modelAfter)
  }

  test("PCA moments batch replay across the flip-then-crash window never double-merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("moments_replay").toString
    val state = s"$dir/state"
    val d = 4
    def batch(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
    val r1 = Seq(1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f, 0f))
    val r2 = Seq(3L -> Seq(0.8f, 0.2f, 0.1f, 0f))
    StreamingPipeline.applyMomentsBatch(batch(r1: _*), 0L, state, d, "embedding")
    StreamingPipeline.applyMomentsBatch(batch(r2: _*), 1L, state, d, "embedding")
    def snap() = StreamingPipeline.pcaSnapshot(spark, state, d).get
      .orderBy("slot").collect().map(_.getLong(1)).toSeq
    val before = snap()
    // crash window: _LATEST points at v1 but the stream checkpoint
    // didn't commit — batch 1 is re-delivered; a re-merge would
    // double batch 1's moment mass
    StreamingPipeline.applyMomentsBatch(batch(r2: _*), 1L, state, d, "embedding")
    assert(snap() == before)
    // n slot reflects exactly 3 vectors, not 4
    val buf = spark.read.parquet(s"$state/moments/v1")
      .orderBy("slot").collect().map(_.getLong(1))
    assert(buf(0) == 3L, buf(0))
  }

  test("token index batch replay across the flip-then-crash window never double-counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tokenix_replay").toString
    val state = s"$dir/state"
    def batch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    StreamingPipeline.applyTokenIndexBatch(
      batch(1L -> "x y x", 2L -> "y z"), 0L, state, "doc_id", "text")
    StreamingPipeline.applyTokenIndexBatch(
      batch(3L -> "x q"), 1L, state, "doc_id", "text")
    def index() = StreamingPipeline.corpusCardsSnapshot(spark, state).get
    val before = index()._2.orderBy("doc_id").collect().map(_.toSeq).toSeq
    // crash window: _LATEST points at v1 but the stream checkpoint
    // didn't commit — the restarted stream re-delivers batch 1. A
    // re-MERGE would double every batch-1 count; replay must skip.
    StreamingPipeline.applyTokenIndexBatch(
      batch(3L -> "x q"), 1L, state, "doc_id", "text")
    assert(index()._2.orderBy("doc_id").collect().map(_.toSeq).toSeq
      == before)
    // and the stream continues normally afterwards
    StreamingPipeline.applyTokenIndexBatch(
      batch(4L -> "q r"), 2L, state, "doc_id", "text")
    val curve = index()._2.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    // cum_tokens 3,5,7,9; cum_vocab: x,y | z | q | r → 2,3,4,5
    assert(curve == Seq((1L, 3L, 2L), (2L, 5L, 3L), (3L, 7L, 4L),
      (4L, 9L, 5L)), curve)
  }
}
