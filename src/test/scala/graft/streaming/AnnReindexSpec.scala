package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.datapipe.Clustering
import org.apache.spark.sql.functions._

/** The AUTO-WIRED ANN reindex trigger (round-15 closure of the q139
  * drift policy): a drifted stream rebuilds the model inside the
  * stream itself, recall measurably recovers, and the versioned-model
  * manifest discipline survives both crash windows of the flip. */
class AnnReindexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * Clustering.Fp).toLong).toArray

  test("auto-reindex: a drifted stream rebuilds the model automatically and probe recall recovers") {
    import spark.implicits._
    import graft.streaming.StreamingPipeline
    val state = java.nio.file.Files.createTempDirectory("ann_auto").toString + "/s"
    val emb = graft.util.Tables.embeddings(spark, dir)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val drifted = emb.filter(col("vec_id") % 2 =!= 0)
      .withColumn("embedding",
        expr("transform(embedding, x -> x + CAST(1.0 AS FLOAT))"))
    StreamingPipeline.applyAnnIndexBatch(even, 0L, state, 8, 3,
      "vec_id", "embedding")
    def modelIds = {
      val f = new java.io.File(s"$state/models")
      if (!f.exists) Seq.empty[Long]
      else f.listFiles.map(_.getName).filter(_.startsWith("v"))
        .map(_.drop(1).toLong).toSeq.sorted
    }
    assert(modelIds == Seq(0L))
    // the drifted batch must fire the trigger INSIDE the stream: a
    // fresh model v1, the base flipped to v1, dead model v0 GC'd
    StreamingPipeline.applyAnnIndexBatch(drifted, 1L, state, 8, 3,
      "vec_id", "embedding")
    assert(modelIds == Seq(1L), modelIds)
    val latest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$state/assign_base/_LATEST"))).trim
    assert(latest == "v1", latest)
    // recall of drifted queries, new model vs the frozen old model,
    // against integer-L2 brute force over the full (even ∪ drifted)
    // corpus
    val all = even.unionByName(drifted)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, v) => id -> quant(v) }
    val qs = drifted.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq
    def bruteTop(qid: Long, qv: Array[Long]) =
      all.filter(_._1 != qid).map { case (id, v) =>
        var s = 0L
        var i = 0
        while (i < qv.length) { val t = qv(i) - v(i); s += t * t; i += 1 }
        (s, id)
      }.sorted.take(5).map(_._2).toSet
    def recallOf(got: Map[Long, Set[Long]]): Double =
      qs.map { case (qid, v) =>
        (got.getOrElse(qid, Set.empty) & bruteTop(qid, quant(v))).size / 5.0
      }.sum / qs.size
    val rebuilt = StreamingPipeline.annIndexSnapshot(spark, state, qs).get
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recallNew = recallOf(rebuilt)
    // measured: the rebuilt index holds the AnnIndexSpec recall floor
    // on the drifted queries (measured 0.96 at nProbe=2 of 8)
    assert(recallNew >= 0.5, s"new=$recallNew")
    // distortion recovered: the fresh model's training distortion sits
    // BELOW half the drifted batch's distortion under the stale model
    // (the 2× trigger margin) — the quantizer fits the new mass again.
    // (On a gross uniform shift recall alone can't discriminate: the
    // stale model funnels ALL drifted vectors into the same few cells,
    // so drifted queries still find their neighbors — what degrades is
    // cell balance, i.e. probe COST, which distortion captures.)
    val oldCents = Clustering.kmeansCentroids(even, k = 8, iters = 3)
    val staleDist = Clustering.ivfDistortion(
      Clustering.ivfIndex(drifted, oldCents), oldCents)
    val newTd = spark.read.parquet(s"$state/models/v1")
      .select(col("tdist")).head().getDouble(0)
    assert(newTd < staleDist / 2, s"newTd=$newTd staleDist=$staleDist")
    // and the trigger is QUIET again: a further batch from the drifted
    // distribution is in-distribution for the fresh model — no
    // rebuild-thrash (model set still exactly {v1} afterwards)
    val drifted2 = emb.filter(col("vec_id") % 4 === 1)
      .withColumn("embedding",
        expr("transform(embedding, x -> x + CAST(1.0 AS FLOAT))"))
    StreamingPipeline.applyAnnIndexBatch(drifted2, 2L, state, 8, 3,
      "vec_id", "embedding")
    assert(modelIds == Seq(1L), modelIds)
  }

  test("reindex crash windows: an unflipped fresh model is never selected; redelivery completes the rebuild") {
    import spark.implicits._
    import graft.streaming.StreamingPipeline
    val state = java.nio.file.Files.createTempDirectory("ann_crash").toString + "/s"
    val emb = graft.util.Tables.embeddings(spark, dir)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    val drifted = odd.withColumn("embedding",
      expr("transform(embedding, x -> x + CAST(1.0 AS FLOAT))"))
    StreamingPipeline.applyAnnIndexBatch(even, 0L, state, 8, 3,
      "vec_id", "embedding")
    StreamingPipeline.applyAnnIndexBatch(odd, 1L, state, 8, 3,
      "vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq
    def snap() = StreamingPipeline.annIndexSnapshot(spark, state, qs)
      .get.collect().map(_.toSeq).toSeq
    val before = snap()
    // CRASH WINDOW 1: rebuild wrote models/v2 but died before the
    // base flip. The orphan model — deliberately garbage — must be
    // invisible to reads (resolution: newest model ≤ base).
    Seq((0, Seq.fill(64)(1234567L), 1.0), (1, Seq.fill(64)(-7654321L), 1.0))
      .toDF("cl", "comps", "tdist")
      .write.mode("overwrite").parquet(s"$state/models/v2")
    assert(snap() == before, "orphan unflipped model leaked into reads")
    // redelivery of the drifted batch 2 overwrites the orphan and
    // completes the rebuild atomically
    StreamingPipeline.applyAnnIndexBatch(drifted, 2L, state, 8, 3,
      "vec_id", "embedding")
    val modelIds = new java.io.File(s"$state/models").listFiles
      .map(_.getName).toSeq.sorted
    assert(modelIds == Seq("v2"), modelIds)
    val after = snap()
    assert(after != before) // the rebuild really changed the index
    // CRASH WINDOW 2: flip-then-crash — the stream checkpoint missed
    // the commit, batch 2 is redelivered AFTER the successful rebuild.
    // The replay must be a no-op for reads: the re-written delta
    // batch_id=2 sits at-or-below the base id and is filtered out.
    StreamingPipeline.applyAnnIndexBatch(drifted, 2L, state, 8, 3,
      "vec_id", "embedding")
    assert(snap() == after, "replay after the flip changed the index")
  }

  test("legacy pre-versioning layout: batch face migrates to models/v0, snapshot face refuses loudly") {
    import spark.implicits._
    import graft.streaming.StreamingPipeline
    val state = java.nio.file.Files.createTempDirectory("ann_legacy").toString + "/s"
    val control = java.nio.file.Files.createTempDirectory("ann_ctrl").toString + "/s"
    val emb = graft.util.Tables.embeddings(spark, dir)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val b1 = emb.filter(col("vec_id") % 4 === 1)
    val b2 = emb.filter(col("vec_id") % 4 === 3)
    // build a populated state with the CURRENT code…
    StreamingPipeline.applyAnnIndexBatch(even, 0L, state, 8, 3,
      "vec_id", "embedding")
    StreamingPipeline.applyAnnIndexBatch(b1, 1L, state, 8, 3,
      "vec_id", "embedding")
    // …then rewrite it into the round-14 layout: quantizer at
    // stateDir/model, schema (cl, comps) — no tdist — and no models/
    spark.read.parquet(s"$state/models/v0").select("cl", "comps")
      .write.parquet(s"$state/model")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/models"), true)
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq
    // read face: a populated legacy dir must refuse loudly — the old
    // code path would answer as if the index were empty/untrained
    val ex = intercept[IllegalArgumentException] {
      StreamingPipeline.annIndexSnapshot(spark, state, qs)
    }
    assert(ex.getMessage.contains("legacy"))
    // batch face: the next batch migrates in place — centroids carried
    // verbatim, tdist backfilled from the live index, legacy dir gone
    // — and does NOT retrain (model set is exactly {v0}, nothing at
    // the current batch id)
    StreamingPipeline.applyAnnIndexBatch(b2, 2L, state, 8, 3,
      "vec_id", "embedding")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/model")))
    val modelIds = new java.io.File(s"$state/models").listFiles
      .map(_.getName).toSeq.sorted
    assert(modelIds == Seq("v0"), modelIds)
    assert(spark.read.parquet(s"$state/models/v0")
      .select(col("tdist")).head().getDouble(0) > 0)
    // end state ≡ a dir that never took the legacy detour: training is
    // deterministic, so a control run of the same three batches under
    // the current layout must serve the identical index
    for ((b, id) <- Seq((even, 0L), (b1, 1L), (b2, 2L)))
      StreamingPipeline.applyAnnIndexBatch(b, id, control, 8, 3,
        "vec_id", "embedding")
    def probeSet(st: String) = StreamingPipeline
      .annIndexSnapshot(spark, st, qs).get.collect().map(_.toSeq).toSet
    assert(probeSet(state) == probeSet(control))
    // migration crash window: v0 written but legacy not yet deleted;
    // the stream redelivers batch 2 — the re-run re-migrates
    // identically (overwriting v0) instead of refusing the mix
    spark.read.parquet(s"$state/models/v0").select("cl", "comps")
      .write.parquet(s"$state/model")
    StreamingPipeline.applyAnnIndexBatch(b2, 2L, state, 8, 3,
      "vec_id", "embedding")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/model")))
    assert(probeSet(state) == probeSet(control))
    // a legacy model with NO assignments (old-code crash window) is
    // deleted outright; the next batch trains fresh at its own id
    val empty = java.nio.file.Files.createTempDirectory("ann_leg0").toString + "/s"
    spark.read.parquet(s"$control/models/v0").select("cl", "comps")
      .write.parquet(s"$empty/model")
    StreamingPipeline.applyAnnIndexBatch(b1, 7L, empty, 8, 3,
      "vec_id", "embedding")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$empty/model")))
    assert(new java.io.File(s"$empty/models").listFiles
      .map(_.getName).toSeq == Seq("v7"))
  }

}
