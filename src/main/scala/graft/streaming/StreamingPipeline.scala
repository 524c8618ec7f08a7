package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Publication

/** Structured Streaming surface (SURVEY §2.10 / §7).
  *
  * The reference is pure batch; its baseline/updatefiles/DeleteCitation
  * mechanism (reference main.py:31-32, 290-305, 761-771) is an
  * *incremental batch* pattern. Here it maps to first-class streaming:
  *
  *  - `latestVersionStream`: `flatMapGroupsWithState` keyed by pub_id
  *    holding the current (filename, is_deleted) winner — arriving
  *    update files revise or tombstone articles continuously, emitting
  *    the new latest version (or nothing while deleted);
  *  - `eventsWindowed`: watermarked tumbling-window aggregation — the
  *    generic streaming agg the events table models.
  *
  * Scale: state is partitioned by pub_id (same key as the batch
  * shuffle); with RocksDB state store this holds the ~30M-article key
  * space comfortably (~100 bytes/key).
  */
object StreamingPipeline {

  /** Per-key state: the winning version so far. */
  final case class VersionState(filename: String, isDeleted: Boolean)

  /** Streaming latest-version-per-PMID with tombstones: emits the new
    * latest publication whenever a newer file revises it; emits nothing
    * when the current winner is a tombstone. */
  def latestVersionStream(spark: SparkSession,
      parsed: Dataset[Publication]): Dataset[Publication] = {
    import spark.implicits._
    parsed
      .groupByKey(_.pub_id)
      .flatMapGroupsWithState[VersionState, Publication](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, versions, state: GroupState[VersionState]) =>
          val incoming = versions.toSeq
          val currentBest = state.getOption
          // latest by lexicographic filename (reference main.py:585),
          // tombstones winning filename ties (same determinism rule as
          // the batch Dedup.latestVersion).
          // Strictly-newer check: re-delivery of an already-applied file
          // (source replay after restart) must not re-emit the row.
          val versionOrd = Ordering.Tuple2[String, Boolean]
          val incomingBest = incoming.maxBy(p => (p.filename, p.is_deleted))(versionOrd)
          if (currentBest.forall(c => versionOrd.lt(
              (c.filename, c.isDeleted),
              (incomingBest.filename, incomingBest.is_deleted)))) {
            state.update(VersionState(incomingBest.filename, incomingBest.is_deleted))
            if (incomingBest.is_deleted) Iterator.empty
            else Iterator.single(incomingBest)
          } else Iterator.empty
      }
  }

  /** Streaming exact deduplication of a document stream by content
    * hash: first arrival of each distinct text wins. State is bounded
    * by the event-time watermark (`dropDuplicatesWithinWatermark` —
    * duplicates separated by more than the watermark horizon are not
    * suppressed; combine with a batch [[graft.datapipe.DedupOps]]
    * sweep for full-history dedup, the standard lambda split at 100 TB).
    * The state key is the raw 16-byte md5 (unhex'd binary, not the
    * 32-char hex string), never the document body; the helper column is
    * dropped so the output schema equals the input schema. */
  def dedupStream(docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__text_md5", unhex(md5(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_md5")
      .drop("__text_md5")

  /** Streaming FUZZY (near-dup) deduplication: the streaming twin of
    * the batch incremental dedup (q75,
    * [[graft.datapipe.DedupOps.minhashNearDupIncremental]]). Per
    * micro-batch:
    *  1. probe the persisted LSH postings index under `stateDir` for
    *     near-dups of the incoming docs (cross) and band the batch
    *     against itself (intra);
    *  2. suppress batch docs that near-duplicate an ALREADY-ACCEPTED
    *     doc (the corpus doc wins regardless of id order) and keep
    *     only the min-id member of each intra-batch dup set;
    *  3. append the survivors' rows, texts, and postings to the state
    *     dirs (suppressed dups never pollute the index).
    * State is on-disk parquet partitioned by batch (`batch_id=N`
    * subdirs), so replay of a committed batch is detected and skipped
    * — the same idempotence contract as [[upsertStream]]. Per-batch
    * work ∝ batch size + matched postings, never the corpus. */
  def nearDupStream(docs: DataFrame, stateDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      minJaccard: Double = 0.5, compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyNearDupBatch(batch, batchId, stateDir, idCol, textCol, minJaccard,
        compactEvery)
    }

  /** One [[nearDupStream]] micro-batch, factored out (same pattern as
    * [[applyUpsertBatch]]) so replay recovery is directly testable.
    * Round 14: the postings/texts state follows the shared BASE+DELTA
    * discipline — per-batch dirs compact into `postings_base/v{N}` /
    * `texts_base/v{N}` every `compactEvery` batches (the base sorted
    * by its probe key, so parquet min/max stats prune probe reads);
    * reads take base ∪ deltas past the base id, so the steady-state
    * file count stays bounded. */
  private[streaming] def applyNearDupBatch(batch: DataFrame, batchId: Long,
      stateDir: String, idCol: String, textCol: String,
      minJaccard: Double, compactEvery: Int = 8): Unit = {
    import graft.datapipe.DedupOps
    require(compactEvery >= 1, s"bad compactEvery $compactEvery")
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val novelDir = new org.apache.hadoop.fs.Path(root, s"novel/batch_id=$batchId")
    if (fs.exists(new org.apache.hadoop.fs.Path(novelDir, "_SUCCESS")))
      return // replayed batch: already fully applied
    val postingsRoot = new org.apache.hadoop.fs.Path(root, "postings")
    val textsRoot = new org.apache.hadoop.fs.Path(root, "texts")
    // a crashed attempt may have left THIS batch's own (uncommitted —
    // the novel dir above is the commit marker, written last) postings/
    // texts behind, possibly with truncated part-files that would fail
    // the root reads below; clear them before reading state
    for (stale <- Seq(new org.apache.hadoop.fs.Path(postingsRoot, s"batch_id=$batchId"),
        new org.apache.hadoop.fs.Path(textsRoot, s"batch_id=$batchId")))
      if (fs.exists(stale)) fs.delete(stale, true)
    val pBase = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(root, "postings_base"))
    val tBase = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(root, "texts_base"))
    val pBaseId = pBase.map(_.getName.drop(1).toLong).getOrElse(-1L)
    val tBaseId = tBase.map(_.getName.drop(1).toLong).getOrElse(-1L)
    val hasDeltas = fs.exists(postingsRoot) &&
      fs.listStatus(postingsRoot).nonEmpty
    val hasCorpus = hasDeltas || pBase.nonEmpty
    val b = batch.select(col(idCol), col(textCol)).cache()
    // deltas: base id < batch_id < current. The upper bound is defense
    // in depth on top of the cleanup above — probing this batch's own
    // leftovers would make every batch doc a near-dup of itself on
    // replay; the lower bound skips absorbed copies awaiting GC.
    val index =
      if (hasCorpus)
        (pBase.map(p => spark.read.parquet(p.toString)).toSeq ++
         (if (hasDeltas) Seq(spark.read.parquet(postingsRoot.toString)
            .filter(col("batch_id") > pBaseId && col("batch_id") < batchId)
            .drop("batch_id")) else Seq.empty))
          .reduce(_ unionByName _)
          .select(col("band_idx"), col("band_key"), col("id"))
      else DedupOps.minhashIndex(b.limit(0), idCol, textCol, md5Based = true)
    val textParts =
      tBase.map(p => spark.read.parquet(p.toString)).toSeq ++
      (if (fs.exists(textsRoot) && fs.listStatus(textsRoot).nonEmpty)
        Seq(spark.read.parquet(textsRoot.toString)
          .filter(col("batch_id") > tBaseId && col("batch_id") < batchId)
          .drop("batch_id")) else Seq.empty)
    val corpusTexts =
      if (hasCorpus && textParts.nonEmpty)
        textParts.reduce(_ unionByName _).select(col(idCol), col(textCol))
      else b.limit(0)
    // dropDuplicates: a re-delivered id may appear in both corpus and
    // batch; the verify join must see one text per id
    val allTexts = corpusTexts.unionByName(b).dropDuplicates(idCol)
    val pairs = DedupOps.minhashNearDupIncremental(b, index, allTexts,
      minJaccard, idCol, textCol, md5Based = true)
    // which endpoint drops: batch∩corpus pair → the batch side;
    // batch-internal pair → the max id (min-id member survives)
    val batchIds = b.select(col(idCol).as("__bid"))
    val dropped = pairs
      .join(batchIds, col("id_a") === col("__bid"), "left_semi")
      .join(batchIds.withColumnRenamed("__bid", "__bid2"),
        col("id_b") === col("__bid2"), "left_semi")
      .select(col("id_b").as(idCol)) // both in batch: max (=id_b) drops
      .unionByName(pairs
        .join(batchIds, col("id_a") === col("__bid"), "left_anti")
        .select(col("id_b").as(idCol))) // id_a is corpus → batch side id_b drops
      .unionByName(pairs
        .join(batchIds.withColumnRenamed("__bid", "__bid2"),
          col("id_b") === col("__bid2"), "left_anti")
        .select(col("id_a").as(idCol))) // id_b is corpus → batch side id_a drops
      .distinct()
    val novel = b.join(dropped, Seq(idCol), "left_anti").cache()
    // novel is the COMMIT MARKER (checked above), so it writes LAST:
    // a crash mid-way leaves postings/texts for this batch that the
    // replay overwrites (and never probes, per the batch_id filter)
    DedupOps.minhashIndex(novel, idCol, textCol, md5Based = true)
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(root, s"postings/batch_id=$batchId").toString)
    novel.write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(root, s"texts/batch_id=$batchId").toString)
    novel.write.mode("overwrite").parquet(novelDir.toString)
    b.unpersist()
    novel.unpersist()
    // periodic compaction AFTER the commit marker (a replayed
    // committed batch early-returns and never re-compacts): fold
    // base ∪ absorbed deltas into a new base version, sorted by the
    // probe key so parquet min/max stats prune probe reads; each base
    // keeps its own manifest, and delta GC is pure cleanup (reads
    // already exclude ids ≤ base)
    if (pBase.map(_.getName.drop(1).toLong)
        .forall(bid => batchId - bid >= compactEvery)) {
      compactDeltasInto(spark, fs, root, "postings", "postings_base",
        pBaseId, batchId, sortCol = Some("band_key"))
      compactDeltasInto(spark, fs, root, "texts", "texts_base",
        tBaseId, batchId, sortCol = Some(idCol))
    }
  }

  /** Shared delta→base compaction step: read `base ∪ deltas in
    * (baseId, upTo]`, write a compacted `baseName/v{upTo}` (optionally
    * sort-clustered), flip its manifest, GC absorbed deltas. */
  private def compactDeltasInto(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, deltaName: String, baseName: String,
      baseId: Long, upTo: Long, sortCol: Option[String]): Unit = {
    val deltaRoot = new org.apache.hadoop.fs.Path(root, deltaName)
    val baseRoot = new org.apache.hadoop.fs.Path(root, baseName)
    val parts =
      (if (baseId >= 0L) Seq(spark.read.parquet(
        new org.apache.hadoop.fs.Path(baseRoot, s"v$baseId").toString))
       else Seq.empty) ++
      (if (fs.exists(deltaRoot) && fs.listStatus(deltaRoot).nonEmpty)
        Seq(spark.read.parquet(deltaRoot.toString)
          .filter(col("batch_id") > baseId && col("batch_id") <= upTo)
          .drop("batch_id"))
       else Seq.empty)
    if (parts.isEmpty) return
    graft.ops.Compaction.writeCompacted(parts.reduce(_ unionByName _),
      new org.apache.hadoop.fs.Path(baseRoot, s"v$upTo").toString,
      targetRows = 1L << 22, sortCol = sortCol)
    commitSnapshot(fs, baseRoot, upTo)
    deleteDeltasUpTo(fs, deltaRoot, upTo)
  }

  /** Per-shard Misra-Gries summary state (counts bounded to k pairs). */
  final case class MgShardState(counts: Map[String, Long])

  /** Streaming heavy hitters: sharded Misra-Gries summaries held in
    * `flatMapGroupsWithState` — O(nShards·k) TOTAL state for an
    * unbounded term stream, where exact streaming counts would grow
    * with the vocabulary. Terms shard by a stable hash, so each term's
    * whole history accumulates in ONE shard's summary and the MG
    * no-false-negative bound applies shard-locally: any term with
    * shard-local frequency > n_shard/(k+1) is guaranteed retained
    * (the batch twin [[graft.datapipe.HeavyHitters]] documents the
    * bound; this reuses its reduce step verbatim). Every trigger emits
    * each updated shard's refreshed candidate set (Update mode) as
    * (shard, term, mg_count), mg_count being the MG LOWER bound of the
    * true count — drive an exact re-count of candidates downstream for
    * exact results, as the batch op does. */
  def heavyHittersStream(spark: SparkSession, terms: Dataset[String],
      k: Int, nShards: Int): Dataset[(Int, String, Long)] = {
    import spark.implicits._
    val agg = new graft.datapipe.HeavyHitters.MgAgg(k)
    terms
      .groupByKey(t => math.floorMod(t.##, nShards))
      .flatMapGroupsWithState[MgShardState, (Int, String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, ts, state: GroupState[MgShardState]) =>
          val buf = ts.foldLeft(
            state.getOption.map(_.counts).getOrElse(Map.empty))(agg.reduce)
          state.update(MgShardState(buf))
          buf.iterator.map { case (t, c) => (shard, t, c) }
      }
  }

  final case class BudgetState(cum: Long)

  /** Streaming token-budget admission: the q83/q94 quota sampler's
    * streaming twin — per-source cumulative token mass accumulates in
    * keyed state and a document is ADMITTED iff the running total
    * INCLUDING it stays within the source's budget. Rejected mass
    * still accrues, so admission stops permanently once a source's
    * quota is crossed — the same strict-prefix semantics as the batch
    * [[graft.datapipe.Packing.tokenBudgetSample]], with the stream's
    * arrival order standing in for the batch op's hash order (within
    * one micro-batch, a source's documents process in id order, so a
    * replayed stream admits an identical set). Null token counts are
    * excluded up front, mirroring the batch op's null-mass rule.
    * State is ONE long per source. */
  def tokenBudgetStream(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long, idCol: String = "doc_id",
      sourceCol: String = "source", tokensCol: String = "n_tokens"): Dataset[(Long, String, Long)] = {
    import docs.sparkSession.implicits._
    docs
      .filter(col(tokensCol).isNotNull)
      .select(col(sourceCol).cast("string"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState, (Long, String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state: GroupState[BudgetState]) =>
          val budget = budgets.getOrElse(src, defaultBudget)
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val admitted = rows.toSeq.sortBy(_._2).flatMap { case (_, id, n) =>
            cum += n
            if (cum <= budget) Some((id, src, n)) else None
          }
          state.update(BudgetState(cum))
          admitted.iterator
      }
  }

  /** Streaming cluster scoring: assign arriving embedding rows to the
    * nearest centroid of a BATCH-trained k-means model
    * ([[graft.datapipe.Clustering.kmeansCentroids]]) — the standard
    * train-offline / score-online split. Stateless narrow map (the
    * centroids ride the closure), so any output mode works and there
    * is no state store. Exactly the batch assignment semantics:
    * integer distances, lowest-index ties. */
  def clusterAssignStream(vecs: DataFrame, centroids: Array[Array[Long]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    graft.datapipe.Clustering.assignWithCentroids(vecs, centroids, idCol, vecCol)

  /** Streaming text featurization: project arriving (id, text) rows
    * into the hashed char-n-gram embedding space
    * ([[graft.datapipe.Featurize]]) — the online half of the
    * text-only semantic path (batch trains k-means on the projected
    * corpus; the stream featurizes + scores new documents against it,
    * composing with [[clusterAssignStream]]). Stateless narrow map:
    * no shuffle, no state store, any output mode; bit-identical to
    * the batch projection by construction (same codepoint fold, same
    * single float rounding). */
  def featurizeStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 32, n: Int = 3): DataFrame =
    graft.datapipe.Featurize.embedDocuments(docs, idCol, textCol, dim, n)

  /** Streaming int8 embedding quantization: arriving embedding rows
    * quantize through [[graft.datapipe.Embeddings.int8Quantize]]
    * UNCHANGED (one narrow codegen'd projection — per-vector
    * symmetric scale needs no corpus state at all). Stateless: no
    * shuffle, no state store, any output mode; bit-identical to the
    * batch op by construction (spec-pinned). The online half of a
    * continuously-ingested embedding store: vectors compress 4× as
    * they arrive. */
  def int8QuantizeStream(vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    graft.datapipe.Embeddings.int8Quantize(vecs, idCol, vecCol)

  /** Streaming PCA projection: project arriving embedding rows onto a
    * BATCH-fitted eigenbasis ([[graft.datapipe.Embeddings
    * .meanCovariance]] + [[graft.datapipe.Embeddings
    * .topEigenvectors]]) — the train-offline / score-online split of
    * the q109 dimensionality reduction, same pattern as cluster
    * scoring against batch centroids. Stateless narrow map (the basis
    * rides the plan as literals — no broadcast, no UDF): bit-identical
    * to the batch projection by construction (spec-pinned). */
  def pcaProjectStream(vecs: DataFrame, mean: Array[Double],
      basis: Array[Array[Double]], idCol: String = "vec_id",
      vecCol: String = "embedding", outCol: String = "pca"): DataFrame =
    graft.datapipe.Embeddings.project(vecs, vecCol, outCol, mean, basis)
      .select(org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(outCol))

  /** Streaming sliding-window chunking: cut arriving documents into
    * fixed-size training windows ([[graft.datapipe.Packing
    * .chunkDocuments]] running UNCHANGED on the streaming frame — the
    * operator is a pure per-row generate, so the batch plan IS the
    * streaming plan). Stateless narrow generate: no shuffle, no state
    * store, any output mode; bit-identical to the batch chunking by
    * construction (spec-pinned). This is the online half of a
    * continuously-fed pretraining pipeline: documents chunk as they
    * arrive, downstream packing/budgeting consumes the chunk stream. */
  def chunkStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 64,
      stride: Int = 48): DataFrame =
    graft.datapipe.Packing.chunkDocuments(docs, idCol, textCol,
      chunkTokens, stride)

  /** Streaming Gopher rule battery: the q112 keep/drop rules running
    * UNCHANGED on the streaming frame ([[graft.datapipe.QualityScore
    * .gopherRules]] is one narrow per-row projection, so the batch
    * plan IS the streaming plan). Stateless — no shuffle, no state
    * store, any output mode; bit-identical to the batch battery by
    * construction (spec-pinned). This is the online admission gate of
    * a continuously-fed ingestion pipeline: each document's rule mask
    * is decided the moment it arrives. */
  def gopherRulesStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    graft.datapipe.QualityScore.gopherRules(docs, idCol, textCol)

  /** Streaming LM fluency scoring: score arriving documents against a
    * BATCH-trained bigram LM ([[graft.datapipe.QualityScore.lmGramProbs]]
    * collected to a map) — the train-offline / score-online split of
    * the q107 perplexity filter. Stateless narrow map: the model rides
    * a broadcast, no shuffle, no state store, any output mode. A UDF
    * is justified here for the same reason as the bloom probe: no
    * builtin probes a broadcast hash map per gram. Exactly the batch
    * semantics on grams the model has seen (same Tok tokenization,
    * Locale.ROOT case fold — `TokSpec` pins SQL ≡ Scala splits);
    * grams absent from the model contribute p_fp = 0 (and pull
    * min_p_fp to 0), flagging out-of-distribution text — at scale,
    * ship the model as a file-backed map or prune it to the top
    * grams, the same size caveat the decontamination twin documents.
    */
  /** Streaming PII redaction: the q123 scrub running UNCHANGED on the
    * streaming frame ([[graft.datapipe.Pii.redact]] is one narrow
    * codegen'd projection, so the batch plan IS the streaming plan —
    * the [[gopherRulesStream]] shape). Stateless, any output mode;
    * bit-identical to batch by construction (parity spec-pinned).
    * The online face of an ingestion pipeline that must scrub BEFORE
    * anything is persisted. */
  def piiRedactStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    graft.datapipe.Pii.redact(docs, idCol, textCol)

  /** Streaming stupid-backoff trigram LM scoring: arriving documents
    * scored under a BATCH-trained reference LM
    * ([[graft.datapipe.QualityScore.backoffLmModelCollected]]) — the
    * q125 train-offline / score-online split. Here the backoff chain
    * is the POINT of the online face: unseen trigrams degrade through
    * bigram → unigram → OOV exactly as the batch cross-split scorer
    * does, so the twin is bit-identical on any document (parity
    * spec-pinned; vocabulary-size caveat as [[lmScoreStream]]). */
  def backoffLmScoreStream(docs: DataFrame, c3: Map[String, Long],
      c2: Map[String, Long], c1: Map[String, Long], n: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val (b3, b2, b1) = (sc.broadcast(c3), sc.broadcast(c2), sc.broadcast(c1))
    val score = udf { (text: String) =>
      graft.datapipe.QualityScore.backoffLmRow(text, b3.value, b2.value,
        b1.value, n)
    }
    docs.select(col(idCol), score(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s._1").as("n_trigrams"), col("__s._2").as("sum_s_fp"),
        col("__s._3").as("min_s_fp"), col("__s._4").as("n_hit3"),
        col("__s._5").as("n_bo2"), col("__s._6").as("n_bo1"),
        col("__s._7").as("n_oov"))
  }

  /** Streaming known-boilerplate sentence scrub: arriving documents
    * cleaned against a BATCH-built [[graft.datapipe.Spans.sentenceIndex]]
    * collected to a broadcast hash set — the online face of q129's
    * incremental dedup (the decontamination-twin pattern: corpus
    * artifact offline, stateless per-row filter online). Exactly the
    * batch index-removal rule; the batch-internal keep-first half
    * needs cross-row state and stays a batch/incremental concern —
    * honest split, same as the near-dup postings twin. A UDF is
    * justified as in the bloom/LM probes: no builtin probes a
    * broadcast set per sentence. Emits (id, n_sents, n_dup_index,
    * n_kept, clean_text); parity vs batch pinned on batches without
    * internal duplicates. */
  def sentenceScrubStream(docs: DataFrame, indexHashes: Set[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(indexHashes)
    val boundary = ("[.!?]+" + graft.util.Tok.WS).r
    val scrub = udf { (text: String) =>
      val sents = boundary.split(
        if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
        .map(s => s.trim.replaceAll("[.!?]+$", "")).filter(_.nonEmpty)
      val kept = sents.filterNot(s =>
        bc.value.contains(graft.datapipe.Hashing.md5Hex16(s)))
      (sents.length.toLong, (sents.length - kept.length).toLong,
        kept.length.toLong, kept.mkString(". "))
    }
    docs.select(col(idCol), scrub(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s._1").as("n_sents"), col("__s._2").as("n_dup_index"),
        col("__s._3").as("n_kept"), col("__s._4").as("clean_text"))
  }

  /** Streaming span corruption: q130's deterministic T5 denoising
    * pairs per arriving document — the mask is a pure function of
    * (id, position, salt), so the online form is a stateless narrow
    * map over the closure twin
    * ([[graft.datapipe.Corruption.spanCorruptRow]], parity
    * spec-pinned); the batch plan's per-doc windows are why it cannot
    * run unchanged on a stream (the repetition-gate precedent). */
  def spanCorruptStream(docs: DataFrame, rate: Double = 0.15,
      salt: String = "", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val corrupt = udf { (id: Long, text: String) =>
      graft.datapipe.Corruption.spanCorruptRow(id, text, rate, salt)
    }
    docs.select(col(idCol), corrupt(col(idCol), col(textCol)).as("__c"))
      .select(col(idCol),
        col("__c._1").as("n_tokens"), col("__c._2").as("n_masked"),
        col("__c._3").as("n_spans"), col("__c._4").as("input_text"),
        col("__c._5").as("target_text"))
  }

  /** Streaming DSIR importance scoring: score arriving documents
    * against a BATCH-trained bucket-weight model
    * ([[graft.datapipe.Importance.importanceModelCollected]]) — the
    * train-offline / score-online split of the q120 data-selection
    * filter, exactly the LM-scoring pattern (model rides a broadcast;
    * a UDF is justified because no builtin probes a broadcast map per
    * feature). A bucket absent from the model means both smoothed
    * counts were 0 ⇒ weight exactly 0, so the map miss IS the batch
    * answer — scores are bit-identical to the batch operator on any
    * document (parity spec-pinned), unlike the LM twin's honest
    * out-of-model caveat. */
  def dsirScoreStream(docs: DataFrame, model: Map[Long, Long],
      norm: Long, buckets: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val score = udf { (text: String) =>
      graft.datapipe.Importance.scoreRow(text, bc.value, norm, buckets)
    }
    docs.select(col(idCol), score(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s._1").as("n_feats"),
        col("__s._2").as("weight_fp"))
  }

  /** Streaming character-repetition gate: the q119 char-fraction
    * Gopher repetition rules per arriving document — within-document
    * statistics need no corpus state, so the online form is a
    * stateless narrow map over the closure twin
    * ([[graft.datapipe.QualityScore.repetitionCharRow]], the exact
    * replay of the batch operator's windows; parity spec-pinned).
    * The batch plan itself shuffles (positional windows + gram
    * aggregates), so unlike [[gopherRulesStream]] it cannot run
    * unchanged on a stream — the per-row twin is the streaming
    * shape. */
  def repetitionCharsStream(docs: DataFrame, nTop: Int = 2,
      nDup: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rep = udf { (text: String) =>
      graft.datapipe.QualityScore.repetitionCharRow(text, nTop, nDup)
    }
    docs.select(col(idCol), rep(col(textCol)).as("__r"))
      .select(col(idCol),
        col("__r._1").as("n_chars"),
        col("__r._2").as(s"top${nTop}_count"),
        col("__r._3").as(s"top${nTop}_chars"),
        col("__r._4").as(s"dup${nDup}_chars"),
        col("__r._5").as("keep_rep"))
  }

  /** Streaming entropy gate: q121's fixed-point codepoint entropy per
    * arriving document (within-document statistic — stateless narrow
    * map over [[graft.datapipe.QualityScore.charEntropyRow]], parity
    * spec-pinned). */
  def charEntropyStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val e = udf { (text: String) =>
      graft.datapipe.QualityScore.charEntropyRow(text)
    }
    docs.select(col(idCol), e(col(textCol)).as("__e"))
      .select(col(idCol),
        col("__e._1").as("n_cp"),
        col("__e._2").as("ent_nfp"),
        col("__e._3").as("milli_bits_per_char"))
  }

  def lmScoreStream(docs: DataFrame, model: Map[String, Long],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val score = udf { (text: String) =>
      val toks =
        if (text == null) Array.empty[String]
        else graft.util.Tok.WsRegex.split(
          text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
      if (toks.length < 2) (0L, 0L, 0L)
      else {
        var i = 0
        var n = 0L
        var s = 0L
        var m = Long.MaxValue
        while (i < toks.length - 1) {
          val p = bc.value.getOrElse(toks(i) + " " + toks(i + 1), 0L)
          n += 1
          s += p
          if (p < m) m = p
          i += 1
        }
        (n, s, m)
      }
    }
    docs.select(col(idCol), score(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s._1").as("n_bigrams"),
        col("__s._2").as("sum_p_fp"),
        col("__s._3").as("min_p_fp"))
  }

  /** Watermarked tumbling-window event aggregation (generic streaming
    * agg; mirrors RelationalQueries.q8EventsHourly as a stream). */
  def eventsWindowed(events: DataFrame,
      watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming sessionization: `session_window` with a dynamic-merge
    * gap — the Structured Streaming twin of the batch
    * [[graft.datapipe.Sessionize]] operator. Sessions close when no
    * event arrives within `gap` (event time) and the watermark passes;
    * state is bounded by the watermark horizon. Output: one row per
    * closed session per user with count and duration. */
  def eventsSessionized(events: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming CDC apply: each micro-batch of keyed upserts/tombstones
    * merges onto a versioned snapshot under `snapshotDir` via
    * [[graft.ops.Merge.applyChanges]] inside `foreachBatch` — the
    * standard Structured-Streaming upsert pattern for sinks without
    * row-level MERGE (a transactional table format would replace the
    * rewrite with a real MERGE INTO; the plumbing is identical).
    *
    * Durability model (a minimal manifest-pointer table format):
    *  - batch N writes a COMPLETE new snapshot to `snapshotDir/v{N}`
    *    (never touches the previous version);
    *  - the `_LATEST` manifest then flips to `v{N}` (tiny single-file
    *    write + rename through the Hadoop FileSystem API, so any
    *    scheme — file://, hdfs://, s3a:// — works, not just the
    *    driver's local disk);
    *  - a crash between the two leaves `_LATEST` pointing at the old
    *    complete version, and the batch replay rewrites `v{N}`
    *    idempotently (re-applying a delta is idempotent — MergeSpec);
    *  - TOMBSTONES ARE RETAINED in the snapshot (dropTombstones =
    *    false): a later stale upsert for a deleted key must lose to
    *    the tombstone's version instead of resurrecting unopposed.
    *    Read the live view via [[snapshot]].
    * Versions older than the previous one are cleaned best-effort. */
  def upsertStream(delta: DataFrame, snapshotDir: String,
      keyCols: Seq[String], versionCol: String, deletedCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    delta.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyUpsertBatch(batch, batchId, snapshotDir, keyCols, versionCol,
        deletedCol)
    }

  /** One [[upsertStream]] micro-batch: merge, snapshot write, manifest
    * flip, cleanup. Factored out so crash-replay recovery is directly
    * testable without steering a real stream into the crash window.
    *
    * Crash-replay: a crash after the `_LATEST` flip but before the
    * stream checkpoint commits makes the restarted stream re-deliver
    * batch N while the manifest already points at `v{N}`. Reading the
    * base from `v{N}` and overwriting the same path is something Spark
    * refuses ("Cannot overwrite a path that is also being read from"),
    * which would wedge the stream permanently — and is unnecessary:
    * `v{N}` already contains this batch's merge result (re-applying a
    * delta is idempotent, MergeSpec), so the rewrite is skipped and
    * only the flip + cleanup re-run. */
  private[streaming] def applyUpsertBatch(batch: DataFrame, batchId: Long,
      snapshotDir: String, keyCols: Seq[String], versionCol: String,
      deletedCol: String): Unit = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val target = new org.apache.hadoop.fs.Path(root, s"v$batchId")
    val current = currentSnapshotPath(fs, root)
    val alreadyApplied = current.exists(_.getName == target.getName)
    if (!alreadyApplied) {
      val merged = current match {
        case Some(p) =>
          val base = spark.read.parquet(p.toString)
          graft.ops.Merge.applyChanges(base,
            batch.select(base.columns.map(col): _*),
            keyCols, versionCol, deletedCol, dropTombstones = false)
        case None =>
          graft.ops.Merge.applyChanges(batch.filter(lit(false)), batch,
            keyCols, versionCol, deletedCol, dropTombstones = false)
      }
      merged.write.mode("overwrite").parquet(target.toString)
    }
    // atomic-enough pointer flip: write sidecar, delete, rename (the
    // no-_LATEST crash window recovers via the newest complete vN)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_LATEST.tmp")
    val out = fs.create(tmp, true)
    out.write(s"v$batchId".getBytes("UTF-8"))
    out.close()
    val manifest = new org.apache.hadoop.fs.Path(root, "_LATEST")
    if (fs.exists(manifest)) fs.delete(manifest, false)
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(s"could not flip $manifest to v$batchId")
    // best-effort cleanup: keep this and the previous version. The
    // nonEmpty guard matters: a stray dir named exactly "v" would make
    // "".toLong throw and fail every subsequent micro-batch.
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        p.getName.drop(1).nonEmpty &&
        p.getName.drop(1).forall(_.isDigit) &&
        p.getName.drop(1).toLong < batchId - 1)
      .foreach(p => fs.delete(p, true))
    ()
  }

  /** Resolve the current snapshot version dir: the `_LATEST` manifest
    * if present, else the newest complete `v{N}` (with `_SUCCESS`) —
    * the crash-window recovery path. */
  private def currentSnapshotPath(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
    if (!fs.exists(root)) return None
    val manifest = new org.apache.hadoop.fs.Path(root, "_LATEST")
    val fromManifest =
      if (fs.exists(manifest)) {
        val in = fs.open(manifest)
        val name = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        in.close()
        Some(new org.apache.hadoop.fs.Path(root, name)).filter(fs.exists)
      } else None
    fromManifest.orElse {
      fs.listStatus(root).map(_.getPath)
        .filter(p => p.getName.startsWith("v") &&
          p.getName.drop(1).forall(_.isDigit) && p.getName.drop(1).nonEmpty)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .sortBy(_.getName.drop(1).toLong)
        .lastOption
    }
  }

  /** Live view of the [[upsertStream]] snapshot: latest version,
    * tombstones filtered. None until the first batch commits. */
  def snapshot(spark: SparkSession, snapshotDir: String,
      deletedCol: String = "is_deleted"): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    currentSnapshotPath(fs, root).map { p =>
      spark.read.parquet(p.toString)
        .filter(!coalesce(col(deletedCol), lit(false)))
    }
  }

  /** STREAMING corpus-card maintenance in a BASE+DELTA layout: each
    * micro-batch writes only its own batch-sized relations — per-doc
    * token counts under `counts/batch_id=N` and a batch token index
    * under `index_delta/batch_id=N` (both pure functions of the
    * batch, so crash-replay overwrites identical bytes) — then flips
    * the `_COMMITTED` marker. Every `compactEvery` batches the deltas
    * fold into a new compacted base `index/v{N}`
    * ([[graft.datapipe.CorpusStats.tokenIndexFold]], written through
    * [[graft.ops.Compaction]] so base file count stays bounded) and
    * the absorbed delta partitions are deleted. Per-BATCH write work
    * is ∝ batch tokens — a tiny batch no longer pays a
    * vocabulary-sized index rewrite; the vocabulary-sized fold runs
    * once per `compactEvery` batches and on snapshot reads.
    *
    * Crash-safety: reads gate counts AND deltas on `_COMMITTED`, and
    * deltas additionally on `batch_id > base`, so every crash window
    * (before the marker; between the marker and the base flip; between
    * the base flip and delta GC — a replay-resurrected absorbed delta
    * is ≤ base and ignored) serves a consistent frontier. Compaction
    * replay is detected by the base manifest already naming
    * `v{batchId}`. Contract: the stream is an APPEND-ONLY corpus —
    * doc ids unique across batches (the q75/q129 index convention); a
    * revised document should flow through [[upsertStream]] and the
    * index be rebuilt, not re-merged. */
  def tokenIndexStream(docs: DataFrame, stateDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyTokenIndexBatch(batch, batchId, stateDir, idCol, textCol,
        compactEvery)
    }

  /** One [[tokenIndexStream]] micro-batch, factored out (the
    * [[applyUpsertBatch]] pattern) so crash-replay recovery is
    * directly testable. */
  private[streaming] def applyTokenIndexBatch(batch: DataFrame,
      batchId: Long, stateDir: String, idCol: String,
      textCol: String, compactEvery: Int = 8): Unit = {
    import graft.datapipe.CorpusStats
    require(compactEvery >= 1, s"bad compactEvery $compactEvery")
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val indexRoot = new org.apache.hadoop.fs.Path(root, "index")
    val deltaRoot = new org.apache.hadoop.fs.Path(root, "index_delta")
    // 1+2: batch-sized relations, overwrite-idempotent under replay
    CorpusStats.docTokenCounts(batch.select(col(idCol), col(textCol)),
        idCol, textCol)
      .write.mode("overwrite").parquet(
        new org.apache.hadoop.fs.Path(root, s"counts/batch_id=$batchId").toString)
    CorpusStats.tokenIndex(batch, idCol, textCol)
      .write.mode("overwrite").parquet(
        new org.apache.hadoop.fs.Path(deltaRoot, s"batch_id=$batchId").toString)
    // 3: commit the batch frontier — reads gate on this marker
    advanceMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"), batchId)
    // 4: periodic compaction (always at batch 0, so a base exists)
    val baseId = currentSnapshotPath(fs, indexRoot)
      .map(_.getName.drop(1).toLong)
    if (baseId.forall(b => batchId - b >= compactEvery)) {
      val deltas = spark.read.parquet(deltaRoot.toString)
        .filter(col("batch_id") > baseId.getOrElse(-1L) &&
          col("batch_id") <= batchId)
        .select(col("token"), col("n_occ"), col("first_doc"))
      val folded = CorpusStats.tokenIndexFold(baseId match {
        case Some(b) => spark.read.parquet(
          new org.apache.hadoop.fs.Path(indexRoot, s"v$b").toString)
          .unionByName(deltas)
        case None => deltas
      }).localCheckpoint(true) // one compute for the sizing count + write
      graft.ops.Compaction.writeCompacted(folded,
        new org.apache.hadoop.fs.Path(indexRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, indexRoot, batchId)
      deleteDeltasUpTo(fs, deltaRoot, batchId)
      // the append-only counts relation compacts too (rows never
      // change, so its fold is a plain union): many per-batch dirs
      // consolidate into counts_base/v{N}. It keeps its OWN manifest —
      // a crash between the index flip and this one must leave the
      // counts read (its base ∪ deltas past its OWN id) complete.
      val countsBaseRoot = new org.apache.hadoop.fs.Path(root, "counts_base")
      val countsRoot = new org.apache.hadoop.fs.Path(root, "counts")
      val prevCounts = currentSnapshotPath(fs, countsBaseRoot)
      val prevCountsId = prevCounts.map(_.getName.drop(1).toLong)
      if (prevCountsId.forall(_ < batchId)) {
        val countDeltas = spark.read.parquet(countsRoot.toString)
          .filter(col("batch_id") > prevCountsId.getOrElse(-1L) &&
            col("batch_id") <= batchId)
          .select(col(idCol), col("n_tokens"))
        graft.ops.Compaction.writeCompacted(
          prevCounts.map(p => spark.read.parquet(p.toString)
            .unionByName(countDeltas)).getOrElse(countDeltas),
          new org.apache.hadoop.fs.Path(countsBaseRoot, s"v$batchId").toString,
          targetRows = 1L << 22)
        commitSnapshot(fs, countsBaseRoot, batchId)
        deleteDeltasUpTo(fs, countsRoot, batchId)
      }
    }
  }

  /** Flip a last-committed-batch marker forward (tmp-write + rename;
    * never regresses). The cross-relation consistency gate where one
    * batch writes several relations that must be read at a single
    * frontier. */
  private def advanceMarker(fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, batchId: Long): Unit = {
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    val tmp = new org.apache.hadoop.fs.Path(
      marker.getParent, marker.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(batchId.toString.getBytes("UTF-8"))
    out.close()
    if (fs.exists(marker)) fs.delete(marker, false)
    if (!fs.rename(tmp, marker))
      throw new java.io.IOException(s"could not flip $marker to $batchId")
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      val s = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
      in.close()
      Some(s.toLong)
    }

  /** GC delta partitions absorbed by a compacted base — pure cleanup:
    * reads already exclude `batch_id <= base`, so a crash between the
    * base flip and this delete (or a replay resurrecting an absorbed
    * delta) changes nothing a reader sees. */
  private def deleteDeltasUpTo(fs: org.apache.hadoop.fs.FileSystem,
      deltaRoot: org.apache.hadoop.fs.Path, upTo: Long): Unit =
    if (fs.exists(deltaRoot))
      fs.listStatus(deltaRoot).map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.startsWith("batch_id=") &&
            n.drop("batch_id=".length).forall(_.isDigit) &&
            n.drop("batch_id=".length).nonEmpty &&
            n.drop("batch_id=".length).toLong <= upTo
        }
        .foreach(p => fs.delete(p, true))

  /** Flip `_LATEST` to `v{batchId}` (tmp-write + rename) and GC
    * snapshot versions older than the previous one — the shared
    * commit step of every versioned-snapshot stream state
    * ([[applyTokenIndexBatch]], [[applyMomentsBatch]]). */
  private def commitSnapshot(fs: org.apache.hadoop.fs.FileSystem,
      snapRoot: org.apache.hadoop.fs.Path, batchId: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(snapRoot, "_LATEST.tmp")
    val out = fs.create(tmp, true)
    out.write(s"v$batchId".getBytes("UTF-8"))
    out.close()
    val manifest = new org.apache.hadoop.fs.Path(snapRoot, "_LATEST")
    if (fs.exists(manifest)) fs.delete(manifest, false)
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(s"could not flip $manifest to v$batchId")
    fs.listStatus(snapRoot).map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        p.getName.drop(1).nonEmpty &&
        p.getName.drop(1).forall(_.isDigit) &&
        p.getName.drop(1).toLong < batchId - 1)
      .foreach(p => fs.delete(p, true))
    ()
  }

  /** Live corpus cards from the [[tokenIndexStream]] state: (Zipf
    * card, Heaps' curve) over everything ingested so far. None until
    * the first batch commits. */
  def corpusCardsSnapshot(spark: SparkSession, stateDir: String,
      k: Int = 1000, idCol: String = "doc_id")
      : Option[(DataFrame, DataFrame)] = {
    import graft.datapipe.CorpusStats
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // every relation is read at the `_COMMITTED` frontier: counts and
    // deltas past it may exist mid-write/mid-crash and would serve a
    // transiently inconsistent card (token mass whose tokens the
    // index hasn't absorbed); deltas at or below the base id are
    // absorbed copies awaiting GC. The base manifest never leads the
    // marker (the marker flips first), so base ∪ gated-deltas is
    // exactly the committed corpus.
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED")).map {
      committed =>
      val base = currentSnapshotPath(fs,
        new org.apache.hadoop.fs.Path(root, "index"))
      val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
      val deltaRoot = new org.apache.hadoop.fs.Path(root, "index_delta")
      // after compaction GC the delta dir can exist but hold no
      // partitions — a schema-less parquet read would throw
      val parts =
        base.map(p => spark.read.parquet(p.toString)).toSeq ++
        (if (fs.exists(deltaRoot) && fs.listStatus(deltaRoot).nonEmpty)
          Seq(spark.read.parquet(deltaRoot.toString)
            .filter(col("batch_id") > baseId && col("batch_id") <= committed)
            .select(col("token"), col("n_occ"), col("first_doc")))
         else Seq.empty)
      val ix = CorpusStats.tokenIndexFold(parts.reduce(_ unionByName _))
      // counts = its own base ∪ deltas past the counts-base id, both
      // inside the committed frontier (base id ≤ committed by the
      // flip order)
      val countsBase = currentSnapshotPath(fs,
        new org.apache.hadoop.fs.Path(root, "counts_base"))
      val countsBaseId = countsBase.map(_.getName.drop(1).toLong)
        .getOrElse(-1L)
      val countsRoot = new org.apache.hadoop.fs.Path(root, "counts")
      val countParts =
        countsBase.map(p => spark.read.parquet(p.toString)).toSeq ++
        (if (fs.exists(countsRoot) && fs.listStatus(countsRoot).nonEmpty)
          Seq(spark.read.parquet(countsRoot.toString)
            .filter(col("batch_id") > countsBaseId &&
              col("batch_id") <= committed)
            .select(col(idCol), col("n_tokens")))
         else Seq.empty)
      val counts = countParts.reduce(_ unionByName _)
      (CorpusStats.zipfCardFromIndex(ix, k),
        CorpusStats.heapsCurveFromIndex(ix, counts, idCol))
    }
  }

  /** Maintain a persisted PCA moment buffer over an embedding stream
    * — the streaming face of the q138 incremental fit. Per
    * micro-batch: one map-side-combined
    * [[graft.datapipe.Embeddings.MomentsAgg]] pass over the batch
    * (work ∝ batch), then
    * [[graft.datapipe.Embeddings.momentsMerge]] folds the batch
    * buffer into the current snapshot (work ∝ the 2+d+d(d+1)/2-row
    * buffer — the corpus is never rescanned), written as a new
    * version and atomically flipped via the `_LATEST` manifest (the
    * [[tokenIndexStream]] convention: a crash-replayed batch id is
    * recognized as already applied and never double-merged).
    * [[pcaSnapshot]] serves the live dominant eigenvector from the
    * newest committed buffer — identical, by the q138 merge
    * guarantee, to refitting the whole corpus ingested so far. */
  def momentsStream(emb: DataFrame, stateDir: String, d: Int,
      vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    emb.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyMomentsBatch(batch, batchId, stateDir, d, vecCol)
    }

  /** One [[momentsStream]] micro-batch, factored out so crash-replay
    * recovery is directly testable. */
  private[streaming] def applyMomentsBatch(batch: DataFrame,
      batchId: Long, stateDir: String, d: Int, vecCol: String): Unit = {
    import graft.datapipe.Embeddings
    val spark = batch.sparkSession
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val momRoot = new org.apache.hadoop.fs.Path(root, "moments")
    val target = new org.apache.hadoop.fs.Path(momRoot, s"v$batchId")
    val current = currentSnapshotPath(fs, momRoot)
    if (!current.exists(_.getName == target.getName)) {
      val bm = batch.select(col(vecCol)).as[Seq[Float]]
        .select(new Embeddings.MomentsAgg(d).toColumn.name("m"))
        .select(posexplode(col("m")).as(Seq("slot", "val")))
      val merged = current match {
        case Some(p) =>
          Embeddings.momentsMerge(spark.read.parquet(p.toString), bm, d)
        case None => bm
      }
      merged.write.mode("overwrite").parquet(target.toString)
    }
    commitSnapshot(fs, momRoot, batchId)
  }

  /** Live PCA from the [[momentsStream]] state: the q137-shaped
    * `(slot, val)` dominant-eigenvector frame (slots 0..d−1 the
    * vector ×2²⁰, slot d the Rayleigh eigenvalue ×2⁴⁰) over
    * everything ingested so far. None until the first committed
    * batch brings at least 2 vectors. */
  def pcaSnapshot(spark: SparkSession, stateDir: String, d: Int,
      iters: Int = 64): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val momRoot = new org.apache.hadoop.fs.Path(root, "moments")
    currentSnapshotPath(fs, momRoot).flatMap { p =>
      import spark.implicits._
      val m: Array[Long] = spark.read.parquet(p.toString)
        .orderBy(col("slot")).select(col("val")).as[Long].collect()
      if (m.length == 0 || m(0) < 2L) None
      else {
        val (v, lam) =
          graft.datapipe.Embeddings.powerIterationFixed(m, d, iters)
        val rows = v.zipWithIndex.map { case (x, i) => (i, x.toLong) } :+
          ((d, lam.toLong))
        Some(spark.createDataFrame(rows.toIndexedSeq).toDF("slot", "val")
          .select(col("slot").cast("int").as("slot"), col("val")))
      }
    }
  }

  /** Maintain a persisted incremental IVF index over an embedding
    * stream — the streaming face of q139. The FIRST arriving batch
    * trains the coarse quantizer (the q95 fixed-point k-means,
    * deterministic, so a crash-replay of that batch retrains the
    * identical model); every batch then appends its
    * [[graft.datapipe.Clustering.ivfIndex]] relation (vec, cell,
    * stored quantized vector) as one overwrite-idempotent partition
    * — per-batch work ∝ batch, the index is never rebuilt.
    * [[annIndexSnapshot]] probes the live index.
    *
    * DRIFT POLICY — AUTO-WIRED: every batch's mean quantizer
    * distortion ([[graft.datapipe.Clustering.ivfDistortion]]) is
    * measured against the live model's own training distortion
    * (stored inside the model file); when
    * [[graft.datapipe.Clustering.ivfReindexDue]] fires (measured in
    * `AnnIndexSpec`: an in-distribution batch stays within ~1.5× the
    * training distortion, a unit-shifted distribution trips 2×), the
    * batch RETRAINS on the full index ∪ batch, reindexes everything
    * under the fresh model into a new compacted base, and flips the
    * base manifest — the rebuild replaces that batch's compaction.
    *
    * Model/coherence discipline: models are VERSIONED
    * (`models/v{id}`, id = the training batchId) and the live model
    * resolves as `max(id ≤ baseId)` (falling back to the smallest id
    * before the first base exists), so the model can never run ahead
    * of the assignments it explains: a crash between the new model
    * write and the base-manifest flip leaves readers on the OLD
    * (model, base) pair, and the structured-streaming redelivery of
    * the uncommitted batch deterministically re-runs the identical
    * rebuild to completion. Dead model versions GC after the flip
    * (pure cleanup — crash leaves harmless orphans the resolution
    * rule never selects). */
  def annIndexStream(emb: DataFrame, stateDir: String, k: Int = 8,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding", compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    emb.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyAnnIndexBatch(batch, batchId, stateDir, k, iters, idCol, vecCol,
        compactEvery)
    }

  private def annModelsRoot(stateDir: String) = s"$stateDir/models"

  /** Round-15 layout migration: a pre-versioning ANN state dir keeps
    * its quantizer at `stateDir/model` (schema (cl, comps) — no
    * stored training distortion). Without detection the versioned
    * resolver sees "no model", silently retrains at the current
    * batch, and mixes new-model assignments with the old deltas —
    * probe results quietly wrong until the next compaction. Detected
    * here, the legacy model is migrated in place to `models/v0`:
    * centroids carry over verbatim and the training distortion is
    * backfilled as the CURRENT index's mean distortion under the
    * legacy model (the state at migration time defines
    * in-distribution for the drift gate — the only honest baseline a
    * legacy dir can offer). Deterministic and idempotent: a crash
    * between the v0 write and the legacy delete re-runs the identical
    * migration. A legacy model with NO assignments yet (old-code
    * crash window between model write and first assign) is simply
    * deleted — the next non-empty batch trains fresh, exactly the
    * no-state path. A dir holding BOTH layouts is corrupt and
    * refused. */
  private[streaming] def migrateLegacyAnnModel(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String): Unit = {
    import spark.implicits._
    import graft.datapipe.Clustering
    val legacy = new org.apache.hadoop.fs.Path(s"$stateDir/model")
    if (!fs.exists(legacy)) return
    // models/v0 alongside the legacy dir is THIS migration's own
    // crash window (v0 written, legacy not yet deleted) — re-running
    // the deterministic migration overwrites v0 identically. Any
    // OTHER version id means genuinely mixed layouts: refuse.
    val preIds = annModelIds(fs, stateDir)
    require(preIds.isEmpty || preIds == Seq(0L),
      s"ANN state dir $stateDir holds BOTH a legacy model/ and versioned " +
        s"models/v${preIds.mkString(",v")} - mixed layouts cannot be " +
        "auto-migrated; remove one")
    val centroids = spark.read.parquet(legacy.toString)
      .orderBy(col("cl")).select(col("comps"))
      .as[Seq[Long]].collect().map(_.toArray)
    val base = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(s"$stateDir/assign_base"))
    val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
    val assignRoot = new org.apache.hadoop.fs.Path(s"$stateDir/assign")
    val deltasExist =
      fs.exists(assignRoot) && fs.listStatus(assignRoot).nonEmpty
    val parts =
      base.map(p => spark.read.parquet(p.toString)).toSeq ++
      (if (deltasExist)
        Seq(spark.read.parquet(assignRoot.toString)
          .filter(col("batch_id") > baseId).drop("batch_id"))
       else Seq.empty)
    val idx = parts.reduceOption(_ unionByName _)
    if (idx.isEmpty || idx.get.isEmpty) { fs.delete(legacy, true); return }
    writeAnnModel(spark, stateDir, 0L, centroids,
      Clustering.ivfDistortion(idx.get, centroids))
    fs.delete(legacy, true)
  }

  /** Sorted ids of all persisted model versions (empty if none). */
  private[streaming] def annModelIds(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(annModelsRoot(stateDir))
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).toSeq.sorted
  }

  /** The model version the LIVE index is assigned under: the newest
    * model at-or-before the current base snapshot — a model written
    * by a crashed rebuild (base never flipped) is never selected —
    * falling back to the initial model before any base exists. */
  private[streaming] def annLiveModelId(
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String,
      baseId: Long): Option[Long] = {
    val ids = annModelIds(fs, stateDir)
    ids.filter(_ <= baseId).lastOption.orElse(ids.headOption)
  }

  /** Read model version `id`: (centroids, training distortion). */
  private[streaming] def readAnnModel(spark: SparkSession,
      stateDir: String, id: Long): (Array[Array[Long]], Double) = {
    import spark.implicits._
    val rows = spark.read.parquet(s"${annModelsRoot(stateDir)}/v$id")
      .orderBy(col("cl")).select(col("comps"), col("tdist"))
      .as[(Seq[Long], Double)].collect()
    (rows.map(_._1.toArray), rows.head._2)
  }

  private def writeAnnModel(spark: SparkSession, stateDir: String,
      id: Long, centroids: Array[Array[Long]], tdist: Double): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, cl) => (cl, c.toSeq, tdist) }.toIndexedSeq
      .toDF("cl", "comps", "tdist")
      .write.mode("overwrite")
      .parquet(s"${annModelsRoot(stateDir)}/v$id")
  }

  /** One [[annIndexStream]] micro-batch, factored out so crash-replay
    * recovery is directly testable. */
  private[streaming] def applyAnnIndexBatch(batch: DataFrame,
      batchId: Long, stateDir: String, k: Int, iters: Int,
      idCol: String, vecCol: String, compactEvery: Int = 8): Unit = {
    import graft.datapipe.Clustering
    require(compactEvery >= 1, s"bad compactEvery $compactEvery")
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    migrateLegacyAnnModel(spark, fs, stateDir)
    val baseRoot = new org.apache.hadoop.fs.Path(root, "assign_base")
    val baseId = currentSnapshotPath(fs, baseRoot)
      .map(_.getName.drop(1).toLong)
    val liveId = annLiveModelId(fs, stateDir, baseId.getOrElse(-1L))
    val (centroids, trainDist) = liveId match {
      case Some(id) => readAnnModel(spark, stateDir, id)
      case None =>
        // first NON-EMPTY arrival trains the quantizer (deterministic
        // training makes the write replay-idempotent). An empty first
        // micro-batch — routine at stream start — must NOT train: a
        // 0-centroid model would persist and silently assign every
        // later vector to cluster 0. Wait for data instead.
        if (batch.isEmpty) return
        val cs = Clustering.kmeansCentroids(batch, idCol, vecCol, k, iters)
        val td = Clustering.ivfDistortion(
          Clustering.ivfIndex(batch, cs, idCol, vecCol), cs)
        writeAnnModel(spark, stateDir, batchId, cs, td)
        (cs, td)
    }
    // assignment delta: a pure function of (batch, model) —
    // overwrite-idempotent under replay (the docTokenCounts pattern)
    val delta = Clustering.ivfIndex(batch, centroids, idCol, vecCol)
      .localCheckpoint(true) // delta write + distortion probe share it
    delta.write.mode("overwrite")
      .parquet(s"$stateDir/assign/batch_id=$batchId")
    // DRIFT GATE: the batch's mean distortion under the live model vs
    // that model's own training distortion — one narrow batch-sized
    // pass, work ∝ batch
    val reindex = !delta.isEmpty && Clustering.ivfReindexDue(trainDist,
      Clustering.ivfDistortion(delta, centroids))
    def liveAssignments(upTo: Long): DataFrame = {
      val deltas = spark.read.parquet(s"$stateDir/assign")
        .filter(col("batch_id") > baseId.getOrElse(-1L) &&
          col("batch_id") <= upTo)
        .drop("batch_id")
      baseId match {
        case Some(b) => spark.read.parquet(
          new org.apache.hadoop.fs.Path(baseRoot, s"v$b").toString)
          .unionByName(deltas)
        case None => deltas
      }
    }
    if (reindex) {
      // AUTO-REINDEX: retrain on everything indexed so far (stored
      // quantized vectors round-trip exactly back to their floats —
      // ×2⁻²⁰ is a power-of-two scale) ∪ the triggering batch, then
      // rebuild the whole base under the fresh model. Order matters
      // for the crash windows: model v{batchId} first (unreferenced
      // until the flip), compacted base v{batchId} second (ditto),
      // manifest flip third (the atomic commit point), GC last (pure
      // cleanup). Redelivery of this batch after any crash re-runs
      // the identical deterministic rebuild.
      val fullVecs = liveAssignments(batchId)
        .select(col(idCol), expr("transform(__cv, " +
          s"c -> CAST(c AS FLOAT) / ${Clustering.Fp})").as(vecCol))
        .localCheckpoint(true) // train + distortion + reindex read it 3x
      val cs = Clustering.kmeansCentroids(fullVecs, idCol, vecCol, k, iters)
      val newIdx = Clustering.ivfIndex(fullVecs, cs, idCol, vecCol)
        .localCheckpoint(true)
      val td = Clustering.ivfDistortion(newIdx, cs)
      writeAnnModel(spark, stateDir, batchId, cs, td)
      graft.ops.Compaction.writeCompacted(newIdx,
        new org.apache.hadoop.fs.Path(baseRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, baseRoot, batchId)
      deleteDeltasUpTo(fs, new org.apache.hadoop.fs.Path(root, "assign"), batchId)
      // GC model versions the resolution rule can no longer select
      annModelIds(fs, stateDir).filter(_ < batchId).foreach { old =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${annModelsRoot(stateDir)}/v$old"), true)
      }
      return
    }
    // periodic compaction: consolidate the per-batch delta partitions
    // into one compacted base (`assign_base/v{N}`, bounded file count
    // via [[graft.ops.Compaction]]) so steady-state append-only
    // ingestion can't become a small-files explosion. Reads take
    // base ∪ deltas past the base id, so a crash before the flip, a
    // crash before delta GC, or a replay-resurrected absorbed delta
    // (id ≤ base) all serve the identical index; a replayed
    // compaction batch finds the manifest already at v{batchId} and
    // skips (batchId − base = 0 < compactEvery).
    if (baseId.forall(b => batchId - b >= compactEvery)) {
      graft.ops.Compaction.writeCompacted(liveAssignments(batchId),
        new org.apache.hadoop.fs.Path(baseRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, baseRoot, batchId)
      deleteDeltasUpTo(fs, new org.apache.hadoop.fs.Path(root, "assign"), batchId)
    }
  }

  /** Probe the live [[annIndexStream]] index: q139-shaped
    * (query_id, rank, neighbor_id, sq_dist) over everything ingested
    * so far. None until the model exists. Queries are given as raw
    * float vectors and quantized with the model convention. */
  def annIndexSnapshot(spark: SparkSession, stateDir: String,
      queries: Seq[(Long, Seq[Float])], nProbe: Int = 2,
      k: Int = 5, idCol: String = "vec_id"): Option[DataFrame] = {
    import graft.datapipe.Clustering
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // a pre-versioning layout must not read as "no model, no data" —
    // that silently answers None over a populated index. The batch
    // face migrates; this read-only face refuses loudly.
    require(!fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/model")),
      s"ANN state dir $stateDir uses the legacy pre-versioning layout " +
        "(stateDir/model) - run one annIndexStream micro-batch to " +
        "auto-migrate it to models/v0 before probing")
    // a crash can land between the first batch's model write and its
    // assign write: the model exists but no assignment data does yet —
    // the index is still empty, not broken, so keep answering None
    // instead of letting the parquet read throw
    val base = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(s"$stateDir/assign_base"))
    val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
    // the LIVE model: newest at-or-before the base (a model written by
    // a crashed rebuild whose base never flipped is never selected)
    val liveId = annLiveModelId(fs, stateDir, baseId)
    if (liveId.isEmpty) return None
    val assignRoot = new org.apache.hadoop.fs.Path(s"$stateDir/assign")
    // after compaction GC the delta dir can exist but hold no
    // partitions — a schema-less parquet read would throw
    val deltasExist =
      fs.exists(assignRoot) && fs.listStatus(assignRoot).nonEmpty
    if (base.isEmpty && !deltasExist) return None
    val (centroids, _) = readAnnModel(spark, stateDir, liveId.get)
    val parts =
      base.map(p => spark.read.parquet(p.toString)).toSeq ++
      (if (deltasExist)
        Seq(spark.read.parquet(s"$stateDir/assign")
          .filter(col("batch_id") > baseId).drop("batch_id"))
       else Seq.empty)
    val idx = parts.reduce(_ unionByName _)
      .select(col(idCol), col("cluster"), col("__cv"))
    val qs = queries.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * Clustering.Fp).toLong).toArray
    }
    Some(Clustering.ivfProbe(idx, centroids, qs, nProbe, k, idCol))
  }

  /** Maintain a live triangle census over an EDGE stream — the
    * streaming face of q150. Per micro-batch: the fresh (never-seen)
    * edges are appended as one overwrite-idempotent delta partition,
    * and [[graft.datapipe.Graph.triangleCensusDelta]] writes updated
    * census rows for ONLY the touched nodes (delta-probe work, write
    * ∝ delta — never ∝ nodes; the base+delta discipline of
    * `tokenIndexStream`/`annIndexStream` from day one). A cross-batch
    * duplicate edge is dropped by an anti-join against the committed
    * edge view, so replays and at-least-once sources both land on the
    * same state. Every `compactEvery` batches both relations fold
    * into fresh compacted bases (latest-per-node for the census,
    * plain union for edges) under the manifest-flip convention.
    * [[graphCensusSnapshot]] reads the live census; the
    * `GraphStreamSpec` pins it bit-equal to the one-shot
    * [[graft.datapipe.Graph.triangleCensus]] of everything ingested. */
  def graphCensusStream(edges: DataFrame, stateDir: String,
      compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    edges.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyGraphCensusBatch(batch, batchId, stateDir, compactEvery)
    }

  /** Committed (u, v) edge view: compacted base ∪ deltas past it, up
    * to the committed frontier. */
  private def graphEdgesView(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String,
      frontier: Long): DataFrame = {
    import spark.implicits._
    val base = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(s"$stateDir/edges_base"))
    val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
    val deltaRoot = new org.apache.hadoop.fs.Path(s"$stateDir/edges_delta")
    val deltasExist = fs.exists(deltaRoot) && fs.listStatus(deltaRoot).nonEmpty
    val parts =
      base.map(p => spark.read.parquet(p.toString)).toSeq ++
      (if (deltasExist)
        Seq(spark.read.parquet(deltaRoot.toString)
          .filter(col("batch_id") > baseId && col("batch_id") <= frontier)
          .drop("batch_id"))
       else Seq.empty)
    if (parts.isEmpty) Seq.empty[(Long, Long)].toDF("u", "v")
    else parts.reduce(_ unionByName _).select(col("u"), col("v"))
  }

  /** Committed latest-per-node census view (node, deg, tri, cc_fp). */
  private def graphCensusView(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String,
      frontier: Long): DataFrame = {
    import spark.implicits._
    val base = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(s"$stateDir/census_base"))
    val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
    val deltaRoot = new org.apache.hadoop.fs.Path(s"$stateDir/census_delta")
    val deltasExist = fs.exists(deltaRoot) && fs.listStatus(deltaRoot).nonEmpty
    val parts =
      base.map(p => spark.read.parquet(p.toString)
        .withColumn("batch_id", lit(-1L))).toSeq ++
      (if (deltasExist)
        Seq(spark.read.parquet(deltaRoot.toString)
          .filter(col("batch_id") > baseId && col("batch_id") <= frontier))
       else Seq.empty)
    if (parts.isEmpty)
      Seq.empty[(Long, Long, Long, Long)].toDF("node", "deg", "tri", "cc_fp")
    else parts.reduce(_ unionByName _)
      .groupBy(col("node"))
      .agg(max_by(struct(col("deg"), col("tri"), col("cc_fp")),
        col("batch_id")).as("s"))
      .select(col("node"), col("s.deg").as("deg"), col("s.tri").as("tri"),
        col("s.cc_fp").as("cc_fp"))
  }

  /** One [[graphCensusStream]] micro-batch, factored out so
    * crash-replay recovery is directly testable. */
  private[streaming] def applyGraphCensusBatch(batch: DataFrame,
      batchId: Long, stateDir: String, compactEvery: Int = 8): Unit = {
    import graft.datapipe.Graph
    require(compactEvery >= 1, s"bad compactEvery $compactEvery")
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return // replayed batch
    val frontier = readMarker(fs, marker).getOrElse(-1L)
    val curEdges = graphEdgesView(spark, fs, stateDir, frontier)
    val curCensus = graphCensusView(spark, fs, stateDir, frontier)
    // never-seen edges only: idempotent under at-least-once delivery
    val fresh = batch
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .join(curEdges, Seq("u", "v"), "left_anti")
      .localCheckpoint(true) // consumed twice: census probe + delta write
    val delta = Graph.triangleCensusDelta(curCensus, curEdges, fresh)
    fresh.write.mode("overwrite").parquet(
      new org.apache.hadoop.fs.Path(root,
        s"edges_delta/batch_id=$batchId").toString)
    delta.write.mode("overwrite").parquet(
      new org.apache.hadoop.fs.Path(root,
        s"census_delta/batch_id=$batchId").toString)
    advanceMarker(fs, marker, batchId)
    // periodic fold into compacted bases (always at batch 0)
    val edgeBaseRoot = new org.apache.hadoop.fs.Path(root, "edges_base")
    val cenBaseRoot = new org.apache.hadoop.fs.Path(root, "census_base")
    val baseId = currentSnapshotPath(fs, edgeBaseRoot)
      .map(_.getName.drop(1).toLong)
    if (baseId.forall(b => batchId - b >= compactEvery)) {
      graft.ops.Compaction.writeCompacted(
        graphEdgesView(spark, fs, stateDir, batchId),
        new org.apache.hadoop.fs.Path(edgeBaseRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, edgeBaseRoot, batchId)
      deleteDeltasUpTo(fs,
        new org.apache.hadoop.fs.Path(root, "edges_delta"), batchId)
      graft.ops.Compaction.writeCompacted(
        graphCensusView(spark, fs, stateDir, batchId),
        new org.apache.hadoop.fs.Path(cenBaseRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, cenBaseRoot, batchId)
      deleteDeltasUpTo(fs,
        new org.apache.hadoop.fs.Path(root, "census_delta"), batchId)
    }
  }

  /** Live census over everything ingested so far (node, deg, tri,
    * cc_fp) — None until the first batch commits. */
  def graphCensusSnapshot(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map(f => graphCensusView(spark, fs, stateDir, f)
        .orderBy(col("node")))
  }

  /** Live PageRank over the [[graphCensusStream]] edge store: the
    * committed edge view, symmetrized, through the q143 exact-integer
    * solve — the state machine accumulates edges incrementally, the
    * rank solve runs on demand (ranks are global: an edge anywhere
    * moves every score, so unlike the census there is no per-node
    * delta shortcut — recompute-on-snapshot IS the honest incremental
    * shape, priced at iterations × node-sized shuffles against the
    * compacted base). None until the first batch commits or while the
    * graph is empty. */
  def graphPageRankSnapshot(spark: SparkSession, stateDir: String,
      iters: Int = 16): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .flatMap { f =>
        val e = graphEdgesView(spark, fs, stateDir, f)
        val sym = e.unionByName(
          e.select(col("v").as("u"), col("u").as("v")))
          .select(col("u").as("src"), col("v").as("dst"))
        if (sym.isEmpty) None
        else Some(graft.datapipe.PageRank.pageRankFixed(sym, iters)
          .orderBy(col("node")))
      }
  }

  /** Live k-core decomposition over the [[graphCensusStream]] edge
    * store: the committed (base + delta) edge view through
    * [[graft.datapipe.Graph.coreness]]'s H-index iteration. Like
    * PageRank (and unlike the census), core numbers are NON-LOCAL —
    * one new edge can cascade core changes across a component — so
    * recompute-on-snapshot against the compacted base is the honest
    * incremental shape: the stream state machine keeps edge ingest
    * ∝ batch, the solve prices at rounds × keyed node-sized work on
    * demand. None until the first batch commits or while empty;
    * `CorenessSpec`'s streaming test pins the snapshot bit-equal to
    * the batch face over the same edges. */
  def graphCorenessSnapshot(spark: SparkSession, stateDir: String,
      rounds: Int = 16): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .flatMap { f =>
        val e = graphEdgesView(spark, fs, stateDir, f)
        if (e.isEmpty) None
        else Some(graft.datapipe.Graph.coreness(e, rounds)
          .orderBy(col("node")))
      }
  }

  /** Streaming drift monitor, init: persist the REFERENCE slice's
    * (axis, bin) counts once — the frozen yardstick every later
    * snapshot compares against (re-running init re-freezes it). */
  def driftStreamInit(ref: DataFrame, stateDir: String): Unit = {
    val stats = graft.datapipe.Drift.docStats(ref).localCheckpoint(true)
    graft.datapipe.Drift.binCounts(stats, lit(true))
      .select(col("axis"), col("bin"), col("ref_cnt"))
      .write.mode("overwrite").parquet(s"$stateDir/ref")
    // value-level reference counts for the KS face (same yardstick
    // freeze, bounded by the token-length support)
    graft.datapipe.Drift.valueCounts(stats, lit(true))
      .select(col("n_tok"), col("r"))
      .write.mode("overwrite").parquet(s"$stateDir/ref_vals")
  }

  /** Streaming drift monitor, per micro-batch: append the batch's
    * bin counts as one overwrite-idempotent delta partition and flip
    * the commit marker (replay of a committed batch is a no-op) —
    * state written per batch is BIN-sized, never corpus-sized. */
  def applyDriftBatch(batch: DataFrame, batchId: Long,
      stateDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    val stats = graft.datapipe.Drift.docStats(batch).localCheckpoint(true)
    graft.datapipe.Drift.binCounts(stats, lit(false))
      .select(col("axis"), col("bin"), col("new_cnt"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/delta/batch_id=$batchId")
    graft.datapipe.Drift.valueCounts(stats, lit(false))
      .select(col("n_tok"), col("n"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/delta_vals/batch_id=$batchId")
    advanceMarker(fs, marker, batchId)
  }

  /** Live KS card: frozen reference value counts vs the committed
    * union of batch deltas, through [[graft.datapipe.Drift.ksFromCounts]]
    * — the bin-free drift monitor beside [[psiDriftSnapshot]], same
    * marker gate, spec-pinned ≡ the one-shot card. */
  def ksDriftSnapshot(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        val ref = spark.read.parquet(s"$stateDir/ref_vals")
        val fresh = spark.read.option("basePath", s"$stateDir/delta_vals")
          .parquet(s"$stateDir/delta_vals")
          .filter(col("batch_id") <= f)
          .groupBy(col("n_tok")).agg(sum(col("n")).as("n"))
        val counts = ref.join(fresh, Seq("n_tok"), "full_outer")
          .select(col("n_tok"), coalesce(col("r"), lit(0L)).as("r"),
            coalesce(col("n"), lit(0L)).as("n"))
        graft.datapipe.Drift.ksFromCounts(counts).orderBy(col("n_tok"))
      }
  }

  /** Live PSI card: frozen reference counts vs the committed union of
    * batch deltas, through the SAME [[graft.datapipe.Drift.cardFromCounts]]
    * math as the batch query — `DriftSpec`'s streaming test pins the
    * snapshot bit-equal to the one-shot card over the same split.
    * None until the first batch commits. Reading is gated on the
    * marker (`batch_id <= committed`), so a crash between a delta
    * write and its commit is invisible. */
  def psiDriftSnapshot(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        val ref = spark.read.parquet(s"$stateDir/ref")
        val fresh = spark.read.option("basePath", s"$stateDir/delta")
          .parquet(s"$stateDir/delta")
          .filter(col("batch_id") <= f)
          .groupBy(col("axis"), col("bin"))
          .agg(sum(col("new_cnt")).as("new_cnt"))
        val counts = ref.join(fresh, Seq("axis", "bin"), "full_outer")
          .select(col("axis"), col("bin"),
            coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
            coalesce(col("new_cnt"), lit(0L)).as("new_cnt"))
        graft.datapipe.Drift.cardFromCounts(counts)
          .orderBy(col("axis"), col("bin"))
      }
  }

  /** Maintain MERGEABLE EXACT-QUANTILE state over a stream of long
    * values — the streaming face of q85/q208 and the one face a
    * monitoring stack still lacked: live latency/length percentiles
    * with bounded per-batch work. The summary is the value-count
    * relation (value, cnt): counts merge by ADDITION, which is
    * associative, commutative and batching-insensitive, so the
    * streamed state is a pure function of the ingested multiset —
    * [[quantileSnapshot]] is bit-equal to the one-shot q85 walk over
    * the union corpus under ANY batch split (`QuantileStreamSpec`).
    *
    * Per micro-batch: one map-side-combined count of the batch's
    * values written as an overwrite-idempotent delta partition (work
    * and write ∝ batch DISTINCT values), then the `_COMMITTED` marker
    * flips. Every `compactEvery` batches the deltas fold (groupBy-sum)
    * into a compacted base `counts_base/v{N}` under the
    * [[applyTokenIndexBatch]] BASE+DELTA discipline — state size is
    * DICTIONARY-sized (∝ distinct values of the metric, e.g. ≤ 2⁶⁴
    * but in practice the support of a latency/length column), never
    * corpus-sized, and steady-state file count stays bounded.
    * Crash windows are the token-index ones: reads gate deltas on the
    * marker and on `batch_id > base`; replay of a committed batch is
    * detected by the marker and skipped. */
  def quantileStream(values: DataFrame, stateDir: String,
      valueCol: String = "v", compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    values.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyQuantileBatch(batch, batchId, stateDir, valueCol, compactEvery)
    }

  /** One [[quantileStream]] micro-batch, factored out so crash-replay
    * recovery is directly testable. */
  private[streaming] def applyQuantileBatch(batch: DataFrame,
      batchId: Long, stateDir: String, valueCol: String,
      compactEvery: Int = 8): Unit = {
    require(compactEvery >= 1, s"bad compactEvery $compactEvery")
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    val baseRoot = new org.apache.hadoop.fs.Path(root, "counts_base")
    val deltaRoot = new org.apache.hadoop.fs.Path(root, "delta")
    // batch-sized relation, pure function of the batch —
    // overwrite-idempotent under replay
    batch.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(deltaRoot,
        s"batch_id=$batchId").toString)
    advanceMarker(fs, marker, batchId)
    // periodic compaction: fold deltas into the base by groupBy-sum
    val baseId = currentSnapshotPath(fs, baseRoot)
      .map(_.getName.drop(1).toLong)
    if (baseId.forall(b => batchId - b >= compactEvery)) {
      val deltas = spark.read.parquet(deltaRoot.toString)
        .filter(col("batch_id") > baseId.getOrElse(-1L) &&
          col("batch_id") <= batchId)
        .select(col("v"), col("cnt"))
      val all = baseId match {
        case Some(b) => spark.read.parquet(
          new org.apache.hadoop.fs.Path(baseRoot, s"v$b").toString)
          .unionByName(deltas)
        case None => deltas
      }
      graft.ops.Compaction.writeCompacted(
        all.groupBy(col("v")).agg(sum(col("cnt")).as("cnt")),
        new org.apache.hadoop.fs.Path(baseRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, baseRoot, batchId)
      deleteDeltasUpTo(fs, deltaRoot, batchId)
    }
  }

  /** Live exact quantiles from the [[quantileStream]] state: the
    * q85-shaped (q, k, value) rows at the requested points over
    * everything committed so far, via the weighted radix walk
    * ([[graft.datapipe.Quantiles.quantilesFromCounts]]) on
    * base ∪ gated deltas. None until the first non-empty batch
    * commits. */
  def quantileSnapshot(spark: SparkSession, stateDir: String,
      qs: Seq[(String, Double)], valueCol: String = "v")
      : Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .flatMap { committed =>
        val base = currentSnapshotPath(fs, new org.apache.hadoop.fs.Path(
          root, "counts_base"))
        val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
        val deltaRoot = new org.apache.hadoop.fs.Path(root, "delta")
        val parts =
          base.map(p => spark.read.parquet(p.toString)).toSeq ++
          (if (fs.exists(deltaRoot) && fs.listStatus(deltaRoot).nonEmpty)
            Seq(spark.read.parquet(deltaRoot.toString)
              .filter(col("batch_id") > baseId &&
                col("batch_id") <= committed)
              .select(col("v"), col("cnt")))
           else Seq.empty)
        if (parts.isEmpty) None
        else {
          val counts = parts.reduce(_ unionByName _)
            .groupBy(col("v")).agg(sum(col("cnt")).as("cnt"))
            .localCheckpoint(true) // n-sum + 8 walk rounds read it
          if (counts.isEmpty) None
          else Some(graft.datapipe.Quantiles
            .quantilesFromCounts(counts, "v", "cnt", qs)
            .withColumnRenamed("v", valueCol))
        }
      }
  }

  /** Streaming EXACT dedup (the q162 join as a state machine), init:
    * freeze the prefix ORDER from a reference corpus (may be empty —
    * all shingles then order as df 0) and seed the index: prefix
    * postings + text store. The frozen order keeps every later batch
    * EXACT (the q162 pigeonhole argument needs one consistent total
    * order, any order), so the index is append-only forever: a doc's
    * prefix under a frozen order never changes. */
  def ppjoinStreamInit(ref: DataFrame, stateDir: String): Unit = {
    import graft.datapipe.DedupOps
    val st = DedupOps.shingledPostings(ref, "doc_id", "text", 3)
      .localCheckpoint(true)
    val dfreq = st.groupBy(col("s")).agg(count(lit(1)).as("df"))
    dfreq.write.mode("overwrite").parquet(s"$stateDir/dfreq")
    val spark = ref.sparkSession
    val frozen = spark.read.parquet(s"$stateDir/dfreq")
    // store layout stays (s, id, n): the rn position column is a
    // candidate-pruning hint the batch faces recompute per batch
    DedupOps.prefixPostings(st, frozen, 1L, 2L)
      .select(col("s"), col("id"), col("n"))
      .write.mode("overwrite").parquet(s"$stateDir/prefix/batch_id=-1")
    ref.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$stateDir/docs/batch_id=-1")
  }

  /** Streaming exact dedup, per micro-batch: emit every pair with
    * Jaccard ≥ 1/2 between the batch and the committed corpus (plus
    * within the batch) via the indexed core — per-batch work ∝ batch
    * + output, the corpus is never re-shingled — then append the
    * batch's prefix postings and texts. All writes are
    * overwrite-idempotent partitions behind the commit marker. Each
    * qualifying pair is discovered exactly once (when its LATER
    * member arrives), so the pair store needs no dedup. */
  def applyPpjoinBatch(batch: DataFrame, batchId: Long,
      stateDir: String): Unit = {
    import graft.datapipe.DedupOps
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    val committed = readMarker(fs, marker).getOrElse(-1L)
    val dfreq = spark.read.parquet(s"$stateDir/dfreq")
    val corpusPre = spark.read.option("basePath", s"$stateDir/prefix")
      .parquet(s"$stateDir/prefix")
      .filter(col("batch_id") <= committed)
      .select(col("s"), col("id"), col("n"))
    val corpusDocs = spark.read.option("basePath", s"$stateDir/docs")
      .parquet(s"$stateDir/docs")
      .filter(col("batch_id") <= committed)
      .select(col("doc_id"), col("text"))
    val allTexts = corpusDocs.unionByName(
      batch.filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")))
    val pairs = DedupOps.ppjoinIncrementalIndexed(
      corpusPre, allTexts, batch, dfreq)
    pairs.write.mode("overwrite").parquet(s"$stateDir/pairs/batch_id=$batchId")
    val st = DedupOps.shingledPostings(batch, "doc_id", "text", 3)
    DedupOps.prefixPostings(st, dfreq, 1L, 2L)
      .select(col("s"), col("id"), col("n"))
      .write.mode("overwrite").parquet(s"$stateDir/prefix/batch_id=$batchId")
    batch.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$stateDir/docs/batch_id=$batchId")
    advanceMarker(fs, marker, batchId)
  }

  /** All exact near-dup pairs discovered so far (committed batches
    * only). `PpjoinSpec` pins: streaming an entire corpus from an
    * empty init equals the ONE-SHOT complete threshold join. None
    * until the first batch commits. */
  def ppjoinPairsSnapshot(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        spark.read.option("basePath", s"$stateDir/pairs")
          .parquet(s"$stateDir/pairs")
          .filter(col("batch_id") <= f)
          .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"))
      }
  }

  /** Stream-stream interval join: pair each right-stream event with
    * the left-stream events of the same key that happened in the
    * window (right.ts - horizon, right.ts] — the "attribute a
    * conversion to recent clicks" shape. Both sides are watermarked so
    * the join state is bounded: a buffered left row can be dropped
    * once the right watermark passes its ts + horizon (Spark derives
    * the state-eviction bound from the interval condition; without the
    * time bound the join would buffer both streams forever).
    * Columns: left (key, ts, …lCols), right (key, rts, …rCols). */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      keyCol: String, horizon: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.withColumnRenamed(keyCol, "__rkey")
      .withWatermark("rts", watermark)
    l.join(r,
      col(keyCol) === col("__rkey") &&
        col("ts") > col("rts") - expr(s"INTERVAL $horizon") &&
        col("ts") <= col("rts"),
      "inner").drop("__rkey")
  }

  /** STREAMING multi-touch attribution (the q179 chain as a state
    * machine): per micro-batch of raw events, attribute the batch's
    * PURCHASES against the committed touch history ∪ the batch's own
    * touches through the SAME factored
    * [[graft.queries.AnalyticsQueries.attributionCore]] the batch
    * query runs, and persist two batch-sized relations — the batch's
    * touches under `touch/batch_id=N` and its per-channel credit
    * partial under `credit/batch_id=N` (both pure functions of the
    * batch + committed state, so crash-replay overwrites identical
    * bytes) — then flip `_COMMITTED`.
    *
    * Why partials sum exactly: a purchase's window count, rank and
    * credit depend ONLY on its own touch set, and each purchase is
    * attributed exactly once (in its arrival batch), so the
    * per-channel sums over committed credit partials are bit-equal to
    * the one-shot q179 rollup — the hash-grade invariant
    * `AttributionStreamSpec` pins by streaming a whole corpus from an
    * empty init.
    *
    * CONTRACT: batches are event-time ordered (a purchase never
    * arrives before a touch it should credit). Under that contract
    * the touch store is append-only, and compaction (every
    * `compactEvery` batches) both bounds the file count and PRUNES
    * touches older than `lookback` behind the newest committed touch
    * — no future purchase can credit them, so per-batch join work
    * stays ∝ batch × the bounded in-window touch history, and state
    * size is ∝ the lookback window, not the stream's lifetime. */
  def attributionStream(events: DataFrame, stateDir: String,
      compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyAttributionBatch(batch, batchId, stateDir, compactEvery)
    }

  private[streaming] def applyAttributionBatch(batch: DataFrame,
      batchId: Long, stateDir: String, compactEvery: Int = 8): Unit = {
    import graft.queries.AnalyticsQueries
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    val committed = readMarker(fs, marker).getOrElse(-1L)
    val batchTouches = AnalyticsQueries.touchesOf(batch)
      .localCheckpoint(true) // consumed twice: attribution + delta write
    val touchView = touchStoreView(spark, fs, stateDir, committed)
      .unionByName(batchTouches)
    val credit = AnalyticsQueries
      .attributionCore(AnalyticsQueries.purchasesOf(batch), touchView)
    batchTouches.write.mode("overwrite")
      .parquet(s"$stateDir/touch/batch_id=$batchId")
    credit.write.mode("overwrite")
      .parquet(s"$stateDir/credit/batch_id=$batchId")
    advanceMarker(fs, marker, batchId)
    // compaction: fold touch deltas into a pruned base (file-count
    // bound + lookback-horizon retention)
    val baseRoot = new org.apache.hadoop.fs.Path(root, "touch_base")
    val baseId = currentSnapshotPath(fs, baseRoot)
      .map(_.getName.drop(1).toLong)
    if (baseId.forall(b => batchId - b >= compactEvery)) {
      val full = touchStoreView(spark, fs, stateDir, batchId)
        .localCheckpoint(true)
      val pruned = full
        .crossJoin(broadcast(full.agg(max(col("t_ts")).as("mx"))))
        .filter(col("mx").isNull ||
          expr("timestampdiff(MICROSECOND, t_ts, mx)" +
            s" <= ${AnalyticsQueries.AttributionLookbackUs}L"))
        .drop("mx")
      graft.ops.Compaction.writeCompacted(pruned,
        new org.apache.hadoop.fs.Path(baseRoot, s"v$batchId").toString,
        targetRows = 1L << 22)
      commitSnapshot(fs, baseRoot, batchId)
      deleteDeltasUpTo(fs, new org.apache.hadoop.fs.Path(root, "touch"),
        batchId)
    }
  }

  /** Committed touch history: compacted base ∪ gated deltas (the
    * census-store read shape). */
  private def touchStoreView(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String,
      committed: Long): DataFrame = {
    val base = currentSnapshotPath(fs,
      new org.apache.hadoop.fs.Path(stateDir, "touch_base"))
    val baseId = base.map(_.getName.drop(1).toLong).getOrElse(-1L)
    val deltaRoot = new org.apache.hadoop.fs.Path(stateDir, "touch")
    val parts =
      base.map(p => spark.read.parquet(p.toString)).toSeq ++
      (if (fs.exists(deltaRoot) && fs.listStatus(deltaRoot).nonEmpty)
        Seq(spark.read.option("basePath", deltaRoot.toString)
          .parquet(deltaRoot.toString)
          .filter(col("batch_id") > baseId && col("batch_id") <= committed)
          .select(col("t_user"), col("t_id"), col("channel"), col("t_ts")))
      else Nil)
    parts.reduceOption(_ unionByName _).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long, String, java.time.LocalDateTime)]
        .toDF("t_user", "t_id", "channel", "t_ts")
    }
  }

  /** STREAMING DAU/WAU (the q184 card as a state machine): each
    * micro-batch writes only its own distinct (user_id, day) rows
    * under `ud/batch_id=N` (a pure function of the batch —
    * crash-replay overwrites identical bytes) behind the commit
    * marker; the snapshot runs the SAME factored
    * [[graft.queries.AnalyticsQueries.stickinessCore]] over the
    * committed distinct union, so streaming ≡ batch is by
    * construction (`AttributionStreamSpec`'s sibling test pins it).
    * State is the distinct user-day relation — bounded by
    * users × days, not event volume. */
  def stickinessStream(events: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyStickinessBatch(batch, batchId, stateDir)
    }

  private[streaming] def applyStickinessBatch(batch: DataFrame,
      batchId: Long, stateDir: String): Unit = {
    import graft.queries.AnalyticsQueries
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    AnalyticsQueries.userDaysOf(batch)
      .write.mode("overwrite").parquet(s"$stateDir/ud/batch_id=$batchId")
    advanceMarker(fs, marker, batchId)
  }

  /** Live DAU/WAU/stickiness over everything ingested. None until the
    * first batch commits. The cross-batch `distinct()` re-dedups
    * user-days seen in several batches — per-day state stays bounded
    * by active users. */
  def stickinessSnapshot(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    import graft.queries.AnalyticsQueries
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        val ud = spark.read.option("basePath", s"$stateDir/ud")
          .parquet(s"$stateDir/ud")
          .filter(col("batch_id") <= f)
          .select(col("user_id"), col("day")).distinct()
        AnalyticsQueries.stickinessCore(ud).orderBy(col("day"))
      }
  }

  /** STREAMING CUSUM/MAD feed monitor (the q193 detector as a state
    * machine): each micro-batch appends its own (event_type, hour)
    * counts under `hc/batch_id=N` (pure function of the batch,
    * overwrite-idempotent) behind the commit marker; the snapshot
    * sums committed deltas to the hourly relation — counts from the
    * same hour split across batches MERGE by summation — and runs the
    * SAME factored [[graft.queries.AnalyticsQueries.cusumFromHourly]]
    * the batch query runs, so streaming ≡ batch is by construction.
    * State is the (type × hour) count relation — bounded by the time
    * horizon, not event volume. Note the detector's medians are
    * corpus-level, so the snapshot RE-SCORES history as the baseline
    * sharpens — that is the q193 semantics applied to a growing
    * window (an online-median variant would be a different, weaker
    * detector). */
  def cusumStream(events: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyCusumBatch(batch, batchId, stateDir)
    }

  private[streaming] def applyCusumBatch(batch: DataFrame,
      batchId: Long, stateDir: String): Unit = {
    import graft.queries.AnalyticsQueries
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    AnalyticsQueries.hourlyCountsOf(batch)
      .write.mode("overwrite").parquet(s"$stateDir/hc/batch_id=$batchId")
    advanceMarker(fs, marker, batchId)
  }

  /** Live CUSUM card over everything ingested — bit-equal to the
    * one-shot q193 on the same events. None until the first batch
    * commits. */
  def cusumSnapshot(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    import graft.queries.AnalyticsQueries
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        val hourly = spark.read.option("basePath", s"$stateDir/hc")
          .parquet(s"$stateDir/hc")
          .filter(col("batch_id") <= f)
          .groupBy(col("event_type"), col("hour"))
          .agg(sum(col("n")).as("n"))
        AnalyticsQueries.cusumFromHourly(hourly)
          .orderBy(col("event_type"), col("hour"))
      }
  }

  /** STREAMING trending terms (the q206 burst detector as a state
    * machine): each micro-batch appends its own (term, day) counts
    * under `td/batch_id=N` (pure function of the batch,
    * overwrite-idempotent) behind the commit marker; the snapshot
    * sums committed deltas — day-splitting batches merge by
    * summation — and runs the SAME factored
    * [[graft.queries.AnalyticsQueries.trendingFromCounts]] as the
    * batch query, so streaming ≡ batch is by construction. State is
    * the (term × day) count relation, bounded by vocabulary × time
    * horizon, never event volume. */
  def trendingStream(events: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyTrendingBatch(batch, batchId, stateDir)
    }

  private[streaming] def applyTrendingBatch(batch: DataFrame,
      batchId: Long, stateDir: String): Unit = {
    import graft.queries.AnalyticsQueries
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(root, "_COMMITTED")
    if (readMarker(fs, marker).exists(_ >= batchId)) return
    AnalyticsQueries.termDayCountsOf(batch)
      .write.mode("overwrite").parquet(s"$stateDir/td/batch_id=$batchId")
    advanceMarker(fs, marker, batchId)
  }

  /** Live trending leaderboard over everything ingested — bit-equal
    * to the one-shot q206 on the same events. None until the first
    * batch commits. */
  def trendingSnapshot(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    import graft.queries.AnalyticsQueries
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        val td = spark.read.option("basePath", s"$stateDir/td")
          .parquet(s"$stateDir/td")
          .filter(col("batch_id") <= f)
          .groupBy(col("term"), col("day"))
          .agg(sum(col("n")).as("n"))
        AnalyticsQueries.trendingFromCounts(td)
          .orderBy(col("day"), col("rank"))
      }
  }

  /** Live per-channel attribution totals over everything ingested —
    * bit-equal to the one-shot q179 rollup on the same events (the
    * credit partials sum exactly; see [[applyAttributionBatch]]).
    * None until the first batch commits. */
  def attributionSnapshot(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    readMarker(fs, new org.apache.hadoop.fs.Path(root, "_COMMITTED"))
      .map { f =>
        spark.read.option("basePath", s"$stateDir/credit")
          .parquet(s"$stateDir/credit")
          .filter(col("batch_id") <= f)
          .groupBy(col("channel"))
          .agg(sum(col("n_touches")).as("n_touches"),
            sum(col("n_purchases")).as("n_purchases"),
            sum(col("credit_fp")).as("credit_fp"))
          .orderBy(col("channel"))
      }
  }
}
