package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.datapipe._
import graft.text.StopWords
import graft.util.{Tables, Tok}

/** Training-data pipeline operators exposed on the driver's query
  * surface (builder brief: dedup family, similarity search, text
  * analysis), all over the synthetic documents/embeddings tables.
  */
object DataPipeQueries {

  def dedupExact(s: SparkSession, d: String): DataFrame =
    DedupOps.exactDedup(Tables.documents(s, d))

  /** md5Based: band keys the DuckDB oracle recomputes bit-for-bit, so
    * both engines test the same LSH candidate set (q13/q54/q55 share
    * this; the fnv fast path stays for non-oracle throughput use). */
  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    DedupOps.minhashNearDupPairs(Tables.documents(s, d), minJaccard = 0.5,
      md5Based = true)

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    DedupOps.simhashNearDupPairs(Tables.documents(s, d), maxHamming = 3,
      md5Based = true)

  def knnCosine(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnBruteForce(emb, emb.filter(col("vec_id") < 5), k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** IVF with nProbe == nCells: every cell is probed, so the result is
    * exactly the brute-force top-k (oracle-verifiable at any SF) while
    * still exercising the full IVF path — centroid training, cell
    * assignment, probe-join pruning. The approximate regime
    * (nProbe < nCells) is covered by the recall spec in DedupOpsSpec. */
  def knnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnIvf(emb, emb.filter(col("vec_id") < 5), k = 5, nCells = 8, nProbe = 8)
      .withColumn("rank", col("rank").cast("long"))
  }

  def cosineNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // cells ∝ √N keeps per-cell pair counts ~constant as the corpus
    // grows (candidate pairs scale linearly, not quadratically)
    val nCells = math.max(8, math.sqrt(emb.count().toDouble).toInt)
    Similarity.cosineNearDupPairs(emb, threshold = 0.45, nCells = nCells)
  }

  def langId(s: SparkSession, d: String): DataFrame =
    LangId.predict(Tables.documents(s, d))

  def textQuality(s: SparkSession, d: String): DataFrame =
    QualityScore.metrics(Tables.documents(s, d))

  def fingerprints(s: SparkSession, d: String): DataFrame =
    DedupOps.fingerprintRows(Tables.documents(s, d))

  /** Dictionary surfaces for the q26 contains-join (words known to
    * occur in the synthetic documents' vocabulary). */
  val dictSurfaces: Seq[String] =
    Seq("spark", "query", "window", "shuffle", "vector", "merge batch",
      "hash join", "columnar", "stream", "sort table")

  /** Substring-dictionary join planned through the custom
    * [[graft.plans.DictionaryJoinStrategy]] (broadcast Aho-Corasick
    * scan instead of BroadcastNestedLoop). Oracle-verified: DuckDB runs
    * the same join with its own contains(). */
  /** Multimodal decode path end-to-end (q52): fake-encode each document
    * as a binary media column, then decode + byte-scan through the
    * batched mapPartitions stage. Integer outputs are recomputable by
    * the oracle because the fake codec is deterministic and the text is
    * ASCII (byte == codepoint). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.fakeMediaTable(s, Tables.documents(s, d))
    Multimodal.mediaStats(s, media).orderBy(col("media_id"))
  }

  /** Incremental near-dup dedup (q75): the steady-state 100 TB shape —
    * the corpus (doc_id % 10 ≠ 0) is banded ONCE into a postings
    * index; the incoming batch (doc_id % 10 = 0) probes the index for
    * cross candidates and bands only itself for intra candidates; both
    * verify with exact Jaccard. Per-batch work is proportional to the
    * batch, never the corpus. The oracle recomputes the identical
    * band keys, the corpus-side degenerate-key cap, and the batch-side
    * bucket rule — the same candidate set, no recall assumption. */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = DedupOps.minhashIndex(corpus, md5Based = true)
    DedupOps.minhashNearDupIncremental(batch, idx, docs, minJaccard = 0.5,
        md5Based = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  def incrementalDedupOracle: String =
    s"""WITH ${minhashBandedCtes("documents")}, corp AS (
      |  SELECT * FROM banded WHERE doc_id % 10 <> 0
      |), bat AS (
      |  SELECT * FROM banded WHERE doc_id % 10 = 0
      |), corpok AS (
      |  SELECT band_idx, band_key FROM corp
      |  GROUP BY band_idx, band_key HAVING count(*) <= 64
      |), crossc AS (
      |  SELECT DISTINCT least(b.doc_id, c.doc_id) AS id_a,
      |    greatest(b.doc_id, c.doc_id) AS id_b
      |  FROM bat b
      |  JOIN corp c ON b.band_idx = c.band_idx AND b.band_key = c.band_key
      |  JOIN corpok o ON o.band_idx = b.band_idx AND o.band_key = b.band_key
      |), batsz AS (
      |  SELECT band_idx, band_key, count(*) AS n FROM bat
      |  GROUP BY band_idx, band_key
      |), intra AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM bat x
      |  JOIN bat y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
      |    AND x.doc_id < y.doc_id
      |  JOIN batsz z ON z.band_idx = x.band_idx AND z.band_key = x.band_key
      |  WHERE z.n BETWEEN 2 AND 64
      |), cand AS (
      |  SELECT id_a, id_b FROM crossc UNION SELECT id_a, id_b FROM intra
      |), pairs AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
      |    CAST(len(a.sh) + len(b.sh) AS BIGINT) AS sum_len
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b
      |)
      |SELECT id_a, id_b, n_inter, sum_len - n_inter AS n_union
      |FROM pairs
      |WHERE n_inter >= 0.5 * (sum_len - n_inter)
      |ORDER BY id_a, id_b""".stripMargin

  /** Repetition metrics (q76): Gopher/MassiveText duplicate-bigram
    * statistics per document — the repetition-filter signal of the
    * quality family, integer-exact for the oracle. */
  def repetition(s: SparkSession, d: String): DataFrame =
    QualityScore.repetitionMetrics(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  def repetitionOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, concat(toks[i], ' ', toks[i + 1]) AS gram
      |  FROM tok, UNNEST(range(1, len(toks))) t(i)
      |  WHERE len(toks) >= 2
      |), c AS (
      |  SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram
      |)
      |SELECT d.doc_id,
      |  CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(COUNT(c.gram), 0) AS BIGINT) AS n_distinct_grams,
      |  CAST(COALESCE(MAX(c.n), 0) AS BIGINT) AS max_gram_count
      |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** REAL audio decode end-to-end (q74): one RIFF/PCM WAV per document
    * (samples from the engine-portable [[Multimodal.synthSample]]
    * formula, container written by javax.sound.sampled), decoded back
    * through the REAL `javax.sound.sampled` path inside the batched
    * mapPartitions stage. The oracle never parses WAV — it recomputes
    * the expected per-file sample statistics arithmetically, so any
    * drift in the decode (sample order, endianness, scaling) breaks
    * the hash compare. */
  def audioDecode(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.synthWavTable(s, Tables.documents(s, d))
    Multimodal.mediaStats(s, media)
      .select(col("media_id"), col("n_payload").as("n_samples"),
        col("sum_bytes"))
      .orderBy(col("media_id"))
  }

  /** DuckDB oracle for q74: payload byte i of file id is
    * ((synthSample(id,i) >> 8) + 128); the arithmetic shift equals
    * floor division by 256 over the full 16-bit range. */
  def audioDecodeOracle: String =
    """WITH n AS (
      |  SELECT doc_id, 200 + doc_id % 100 AS n FROM documents
      |), s AS (
      |  SELECT doc_id, n, unnest(range(n)) AS i FROM n
      |)
      |SELECT doc_id AS media_id,
      |  CAST(any_value(n) AS BIGINT) AS n_samples,
      |  CAST(SUM(CAST(floor((((doc_id * 7 + i * 37) % 65536) - 32768) / 256.0) AS BIGINT) + 128) AS BIGINT) AS sum_bytes
      |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** Windowed audio feature extraction (q140): the "feature-extract"
    * stage of the multimodal pipeline made real AND oracle-pinned —
    * [[Multimodal.audioFrameFeatures]] REALLY decodes each document's
    * synthesized 16-bit WAV through `javax.sound.sampled` (the
    * full-resolution twin of q74's byte-stat decode) and emits exact
    * integer per-64-sample-frame features (sum, min, max,
    * zero-crossing count). The decode is a bit-exact PCM passthrough,
    * so the oracle recomputes every frame from the synthesis
    * arithmetic `((doc_id·7 + i·37) mod 65536) − 32768` without
    * parsing a byte. Scale shape: one batched mapPartitions pass,
    * per-row work ∝ payload, no shuffle before the presentation
    * sort. */
  def audioFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.synthWavTable(s, Tables.documents(s, d))
    Multimodal.audioFrameFeatures(s, media)
      .orderBy(col("media_id"), col("frame_id"))
  }

  def audioFeaturesOracle: String =
    """WITH n AS (
      |  SELECT doc_id, 200 + doc_id % 100 AS n FROM documents
      |), sq AS (
      |  SELECT doc_id, n, unnest(range(n)) AS i FROM n
      |), v AS (
      |  SELECT doc_id, i, i // 64 AS f,
      |    ((doc_id * 7 + i * 37) % 65536) - 32768 AS s,
      |    CASE WHEN i % 64 <> 0
      |      THEN ((doc_id * 7 + (i - 1) * 37) % 65536) - 32768 END AS sp
      |  FROM sq
      |)
      |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_in_frame,
      |  CAST(SUM(s) AS BIGINT) AS sum_s,
      |  CAST(MIN(s) AS BIGINT) AS min_s,
      |  CAST(MAX(s) AS BIGINT) AS max_s,
      |  CAST(SUM(CASE WHEN sp IS NOT NULL AND ((s >= 0) <> (sp >= 0))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_zc
      |FROM v GROUP BY doc_id, f ORDER BY media_id, frame_id""".stripMargin

  /** Spectral audio features (q142): exact integer DFT bin energies
    * per q140 frame ([[Multimodal.audioSpectralFeatures]]) — the
    * frequency-domain stats an audio-quality gate thresholds (hum /
    * hiss bins), REALLY decoded through `javax.sound.sampled` and
    * recomputed by the oracle from the synthesis arithmetic plus the
    * SAME 64-entry fixed-point trig literal table both engines share
    * ([[Multimodal.trigTable]] — the q109 shared-literal convention).
    * re/im are plain BIGINT sums; the energy squares are formed in
    * 128-bit on both sides and truncate-divided back into range. */
  def audioSpectral(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.synthWavTable(s, Tables.documents(s, d))
    Multimodal.audioSpectralFeatures(s, media)
      .orderBy(col("media_id"), col("frame_id"), col("bin"))
  }

  def audioSpectralOracle: String = {
    val trig = Multimodal.trigTable
      .map { case (j, c, sn) => s"($j, $c, $sn)" }.mkString(", ")
    val bins = Multimodal.SpectralBins.map(k => s"($k)").mkString(", ")
    val fp = Multimodal.SpectralFp
    s"""WITH n AS (
      |  SELECT doc_id, 200 + doc_id % 100 AS n FROM documents
      |), sq AS (
      |  SELECT doc_id, n, unnest(range(n)) AS i FROM n
      |), v AS (
      |  SELECT doc_id, i // 64 AS f, i % 64 AS j,
      |    ((doc_id * 7 + i * 37) % 65536) - 32768 AS s
      |  FROM sq
      |), trig(j, c, sn) AS (VALUES $trig
      |), bins(k) AS (VALUES $bins
      |), b AS (
      |  SELECT v.doc_id, v.f, bins.k,
      |    CAST(SUM(v.s * t.c) AS BIGINT) AS re,
      |    CAST(SUM(v.s * t.sn) AS BIGINT) AS im
      |  FROM v CROSS JOIN bins JOIN trig t ON t.j = (bins.k * v.j) % 64
      |  GROUP BY v.doc_id, v.f, bins.k
      |)
      |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_id,
      |  CAST(k AS INTEGER) AS bin, re AS re_fp, im AS im_fp,
      |  CAST((CAST(re AS HUGEINT) * re + CAST(im AS HUGEINT) * im)
      |    // $fp AS BIGINT) AS energy_fp
      |FROM b ORDER BY media_id, frame_id, bin""".stripMargin
  }

  /** Perceptual image near-dup (q92): one REAL PNG per document
    * (xor-mixed synthetic pixels, docs id % 10 == 1 planted as noisy
    * near-dups of id − 1), decoded through the real `javax.imageio`
    * path, dHashed, and paired by the exact hamming pigeonhole
    * blocking at maxHamming = 8 (planted pairs measure ≤ 3, unrelated
    * pairs ≥ 14). The oracle never parses PNG — the RGB-gray encode →
    * BT.601 luminance loop is integer-lossless, so it recomputes the
    * pixels, 9×8 cell sums, dHash bits, and brute-force hamming
    * arithmetically ([[graft.datapipe.Perceptual]]). */
  def imageNearDup(s: SparkSession, d: String): DataFrame =
    Perceptual.synthImageNearDupPairs(s, Tables.documents(s, d), maxHamming = 8)

  def imageNearDupOracle: String = {
    def base(id: String) =
      s"16 + (xor(($id + 1) * 2654435761 + x * 40503, y * 65027 + x * y * 2246822519) % 224)"
    s"""WITH px AS (
      |  SELECT doc_id, x, y,
      |    CASE WHEN doc_id % 10 = 1 THEN
      |      ${base("(doc_id - 1)")}
      |        + CASE WHEN (x * 64 + y) % 37 = 0 THEN 5 ELSE 0 END
      |    ELSE
      |      ${base("doc_id")}
      |    END AS v
      |  FROM documents, UNNEST(range(72)) tx(x), UNNEST(range(64)) ty(y)
      |), cell AS (
      |  SELECT doc_id, x // 8 AS cx, y // 8 AS cy, SUM(v) AS s
      |  FROM px GROUP BY doc_id, x // 8, y // 8
      |), bits AS (
      |  SELECT a.doc_id, a.cy * 8 + a.cx AS b, (b2.s > a.s) AS bit
      |  FROM cell a JOIN cell b2 ON b2.doc_id = a.doc_id
      |    AND b2.cy = a.cy AND b2.cx = a.cx + 1
      |  WHERE a.cx < 8
      |), ham AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
      |    CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
      |  FROM bits x JOIN bits y ON x.b = y.b AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id
      |)
      |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 8
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** Video container metadata (q93): one REAL container per document —
    * RIFF/AVI for even ids, ISO-BMFF MP4 for odd — written with
    * spec-correct chunk/box sizes and parsed back through the
    * bounds-checked header walks in [[graft.datapipe.VideoContainer]]
    * (avih/strh for AVI; mvhd/tkhd/hdlr/stsd/stts for MP4). Frame
    * payloads are never read: this is the O(header) filter/bucket/
    * budget pass a curation pipeline runs before any GPU decode sees
    * the bytes. The oracle never parses a container — every field
    * derives from doc_id arithmetic ([[VideoContainer.fieldsFor]]), so
    * any drift in either walk (offset, endianness, track dispatch,
    * stts summation, duration rescale) breaks the hash compare. */
  def videoMeta(s: SparkSession, d: String): DataFrame = {
    val media = VideoContainer.synthVideoTable(s, Tables.documents(s, d))
    VideoContainer.videoMeta(s, media)
      .select(col("media_id"), col("container"), col("codec"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames"), col("duration_ms"),
        col("n_tracks").cast("long").as("n_tracks"))
      .orderBy(col("media_id"))
  }

  def videoMetaOracle: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'avi' ELSE 'mp4' END AS container,
      |  CASE doc_id % 3 WHEN 0 THEN 'mjpg' WHEN 1 THEN 'h264' ELSE 'vp80' END AS codec,
      |  CAST(160 + (doc_id % 16) * 16 AS BIGINT) AS width,
      |  CAST(120 + (doc_id % 9) * 8 AS BIGINT) AS height,
      |  CAST(24 + doc_id % 240 AS BIGINT) AS n_frames,
      |  CAST((24 + doc_id % 240)
      |    * (CASE doc_id % 3 WHEN 0 THEN 40000 WHEN 1 THEN 33333 ELSE 20000 END)
      |    // 1000 AS BIGINT) AS duration_ms,
      |  CAST(1 + (doc_id // 2) % 2 AS BIGINT) AS n_tracks
      |FROM documents ORDER BY media_id""".stripMargin

  /** REAL video frame decode (q136): [[VideoContainer.decodeDibFrames]]
    * over a corpus of uncompressed-DIB AVIs
    * ([[VideoContainer.synthAviDib]] — real RIFF containers, raw
    * bottom-up BGR '00db' frames, the one video codec the JVM decodes
    * with no codec library). Every decoded pixel derives from doc_id
    * arithmetic, so the oracle recomputes the per-video Rec.601 luma
    * sums and the frame-0 TOP-LEFT pixel (stored in the LAST DIB row
    * — the stat that pins bottom-up decode, not just byte sums)
    * without parsing a byte. Compressed codecs (mjpg/h264/vp80)
    * remain metadata-only (q93), honestly: no JDK codec. */
  def videoFrames(s: SparkSession, d: String): DataFrame = {
    val media = VideoContainer.synthDibTable(s, Tables.documents(s, d))
    VideoContainer.decodeDibFrames(s, media)
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames_dec"), col("n_bytes"),
        col("sum_luma_milli"), col("corner_luma_milli"))
      .orderBy(col("media_id"))
  }

  def videoFramesOracle: String =
    """WITH geo AS (
      |  SELECT doc_id, 8 + (doc_id % 5) * 4 AS w,
      |    6 + (doc_id % 3) * 2 AS h, 2 + doc_id % 3 AS nf
      |  FROM documents
      |), pf AS (
      |  SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM geo
      |), py AS (
      |  SELECT doc_id, w, h, nf, f, unnest(range(0, h)) AS y FROM pf
      |), px AS MATERIALIZED (
      |  SELECT doc_id, w, h, nf, f, y, unnest(range(0, w)) AS x FROM py
      |), luma AS (
      |  SELECT doc_id, w, h, nf, f, y, x,
      |    299 * ((doc_id + f * 31 + y * 7 + x * 3 + 2) % 251)
      |    + 587 * ((doc_id + f * 31 + y * 7 + x * 3 + 1) % 251)
      |    + 114 * ((doc_id + f * 31 + y * 7 + x * 3 + 0) % 251) AS lm
      |  FROM px
      |)
      |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height, CAST(nf AS BIGINT) AS n_frames_dec,
      |  CAST(nf * h * w * 3 AS BIGINT) AS n_bytes,
      |  CAST(SUM(lm) AS BIGINT) AS sum_luma_milli,
      |  CAST(MAX(CASE WHEN f = 0 AND y = h - 1 AND x = 0 THEN lm END)
      |    AS BIGINT) AS corner_luma_milli
      |FROM luma GROUP BY doc_id, w, h, nf ORDER BY media_id""".stripMargin

  /** Stratified deterministic sampling (q53): per-language data-mix
    * weights over the documents corpus — en kept at 50%, zh at 12.5%,
    * everything else at 25%. The oracle recomputes the identical
    * md5-prefix predicate per stratum. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Sampling.stratified(Tables.documents(s, d), "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 0.125), defaultFraction = 0.25)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Train/val/test split manifest (q77): every document labeled with
    * its keyspace band in ONE scan (no per-split filter+union, no
    * shuffle) — the split-assignment op a training pipeline materializes
    * next to the corpus. The oracle recomputes the identical md5-prefix
    * CASE chain, so assignment is engine-portable by construction. */
  def splitManifest(s: SparkSession, d: String): DataFrame =
    Sampling.assignSplit(Tables.documents(s, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id"))

  def splitManifestOracle: String = {
    val key = "substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)"
    s"""SELECT doc_id, source,
       |  CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |       WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Weighted sample without replacement (q78): 50 documents drawn
    * with probability ∝ n_chars via Efraimidis–Spirakis priorities
    * ln(u)/w on the deterministic hash uniform u — upweighting long
    * documents the way a data-mix samples by token count. Plans as
    * TakeOrderedAndProject (per-partition k-heaps), never a global
    * sort. The oracle recomputes the identical priority; the measured
    * rank-50/51 priority gap at sf0.01 is 6e-6 absolute (2e-2
    * relative) vs ~1e-16 relative cross-engine ln ULP drift — 14
    * orders of margin, so the selected set is stable. */
  def weightedSample(s: SparkSession, d: String): DataFrame =
    Sampling.weightedTopK(Tables.documents(s, d), "doc_id", "n_chars",
        k = 50, salt = "wt")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  def weightedSampleOracle: String =
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'wt'), 1, 8) AS BIGINT) + 0.5)
      |        / 4294967296.0) / CAST(n_chars AS DOUBLE) AS pri
      |  FROM documents WHERE n_chars > 0
      |  ORDER BY pri DESC, doc_id LIMIT 50
      |) ORDER BY doc_id""".stripMargin

  /** Per-group top-k (q79): the 5 longest documents per source via the
    * bounded-buffer [[TopK]] Aggregator — map-side combine, one keyed
    * exchange carrying ≤ k pairs per (group, partition) — instead of
    * the window-sort form that shuffles and sorts the whole corpus.
    * The oracle IS the window form: both produce the identical
    * (score desc, id asc) total order. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame =
    TopK.topKPerGroup(Tables.documents(s, d), "source", "n_chars",
        "doc_id", k = 5)
      .orderBy(col("source"), col("rank"))

  def topkPerGroupOracle: String =
    """SELECT source, rank, doc_id, n_chars FROM (
      |  SELECT source, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
      |  FROM documents WHERE n_chars IS NOT NULL
      |) WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  /** Keyword extraction (q80): top-3 distinctive terms per document —
    * (tf desc, df asc, term asc), the TF-IDF order restricted to
    * integer comparisons so both engines rank identically (see
    * [[graft.datapipe.Keywords]] for why the ln-based float score is
    * deliberately not emitted). Stopwords are the same generated
    * Glasgow list the quality oracle uses. */
  def tfidfKeywords(s: SparkSession, d: String): DataFrame =
    Keywords.topKeywords(Tables.documents(s, d), "doc_id", "text",
        k = 3, stopwords = StopWords.glasgow)
      .orderBy(col("doc_id"), col("rank"))

  def tfidfKeywordsOracle: String = {
    val stopList = StopWords.glasgow.toSeq.sorted
      .map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '${Tok.WS}'),
       |    t -> t <> '' AND NOT list_contains($stopList, t))) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY doc_id, term
       |), df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
       |), r AS (
       |  SELECT doc_id, term, tf.tf, df.df,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tf.tf DESC, df.df ASC, term ASC) AS BIGINT) AS rank
       |  FROM tf JOIN df USING (term)
       |)
       |SELECT doc_id, rank, term, tf, df FROM r
       |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  }

  /** Heavy hitters (q81): every token that is ≥ 0.5% of all token
    * occurrences, EXACT — candidates from a bounded-state Misra-Gries
    * partial aggregate (O(k) per partition crosses the wire, never the
    * vocabulary), then exact counts for candidates only. The integer
    * cross-multiplied threshold and the no-false-negative MG bound
    * make the output independent of partitioning, so the oracle is a
    * plain GROUP BY ... HAVING. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), Tok.WS)).as("term"))
      .filter(col("term") =!= "")
    HeavyHitters.frequentTerms(toks, "term", num = 1, denom = 200,
        sketchK = 512)
      .orderBy(col("n").desc, col("term"))
  }

  def heavyHittersOracle: String =
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '${Tok.WS}'),
       |    t -> t <> '')) AS term
       |  FROM documents
       |), tot AS (SELECT count(*) AS total FROM tok)
       |SELECT term, CAST(count(*) AS BIGINT) AS n
       |FROM tok, tot
       |GROUP BY term, tot.total
       |HAVING count(*) * 200 >= tot.total
       |ORDER BY n DESC, term""".stripMargin

  /** Duplicated-span metrics (q82): for every document, how many of
    * its 8-token spans occur more than once in the corpus — the exact
    * substring-duplication signal (Lee et al. 2022) that drives
    * span-level dedup, measured without a suffix array: one md5 per
    * span, a partial-aggregated per-hash count, one span⇄count join.
    * Integer-exact; the oracle recomputes the identical md5 span
    * hashes. */
  def dupSpans(s: SparkSession, d: String): DataFrame =
    Spans.dupSpanMetrics(Tables.documents(s, d), "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))

  def dupSpansOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), sp AS (
       |  SELECT doc_id, substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS h
       |  FROM tok, UNNEST(range(1, len(toks) - 6)) t(i)
       |  WHERE len(toks) >= 8
       |), c AS (
       |  SELECT h, count(*) AS occ FROM sp GROUP BY h
       |)
       |SELECT d.doc_id,
       |  CAST(COUNT(sp.h) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(SUM(CASE WHEN c.occ > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_spans
       |FROM documents d
       |LEFT JOIN sp ON sp.doc_id = d.doc_id
       |LEFT JOIN c ON c.h = sp.h
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Span REMOVAL (q89): the dedup ACTION behind q82's measurement —
    * every occurrence of a duplicated 8-token span after the corpus-
    * wide first (keep-first by min (doc_id, offset)) is dropped and
    * the surviving tokens re-joined. The oracle replays the identical
    * policy with window functions over the same md5 span hashes;
    * clean text is compared via md5 so the gate stays compact. */
  def spanRemoval(s: SparkSession, d: String): DataFrame =
    Spans.removeDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
        n = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  def spanRemovalOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), sp AS (
       |  SELECT doc_id, i, substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS h
       |  FROM tok, UNNEST(range(1, len(toks) - 6)) t(i)
       |  WHERE len(toks) >= 8
       |), k AS (
       |  SELECT doc_id, i,
       |    count(*) OVER (PARTITION BY h) AS occ,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
       |  FROM sp
       |), rem AS (
       |  SELECT DISTINCT doc_id, i + d AS j
       |  FROM k, UNNEST(range(0, 8)) o(d)
       |  WHERE occ > 1 AND rn > 1
       |), tp AS (
       |  SELECT doc_id, j, toks[j] AS tok
       |  FROM tok, UNNEST(range(1, len(toks) + 1)) t(j)
       |), kept AS (
       |  SELECT tp.doc_id, tp.j, tp.tok
       |  FROM tp LEFT JOIN rem ON rem.doc_id = tp.doc_id AND rem.j = tp.j
       |  WHERE rem.j IS NULL
       |)
       |SELECT t.doc_id,
       |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(count(kept.j), 0) AS BIGINT) AS n_kept,
       |  md5(COALESCE(string_agg(kept.tok, ' ' ORDER BY kept.j), '')) AS clean_md5
       |FROM tok t LEFT JOIN kept ON kept.doc_id = t.doc_id
       |GROUP BY t.doc_id, t.toks
       |ORDER BY t.doc_id""".stripMargin

  /** Trained BPE (q90): learn a 24-merge table from the exact corpus
    * word histogram (the FULL histogram — every distinct word counts,
    * no top-K truncation) and encode every document with it — real
    * learned subword tokens, not a proxy count. The
    * oracle REPLAYS THE ENTIRE TRAINING in DuckDB: a generated chain
    * of 24 CTE stages, each counting symbol pairs over the previous
    * segmentation, picking the same (count desc, pair asc) merge, and
    * applying it with the same boundary-delimited string replace the
    * engine codegen uses — so a single bit of divergence anywhere in
    * training or encode flips every downstream hash. BMP fidelity
    * note: Java regex `(.)` and RE2 `(.)` both split per codepoint;
    * the corpus token space is ASCII (see MinhashMirrorSql for the
    * same convention). */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = trainedMerges(s, d)
    Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        md5(col("bpe_text")).as("bpe_md5"))
      .orderBy(col("doc_id"))
  }

  private val BpeMerges = 24

  /** Per-JVM memo of the trained merge table, keyed by canonical data
    * dir (+ merge count): q90, q94, and q104 all train THE SAME
    * tokenizer on the same corpus, so within one bench/verify JVM the
    * deterministic trainer's M sequential rounds were being paid three
    * times for an identical answer. The memo is semantics-free because
    * training is deterministic (exact counts, total merge order) —
    * the three queries stay independently runnable, they just share
    * the artifact, the same way a production pipeline trains a
    * tokenizer once and fans it out. Tests use unique temp dirs and
    * the driver runs a fresh JVM per round, so a key can never go
    * stale within a process lifetime. */
  private val mergeMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Int), Seq[(String, String)]]

  private def trainedMerges(s: SparkSession, d: String): Seq[(String, String)] =
    mergeMemo.getOrElseUpdate(
      (new java.io.File(d).getCanonicalPath, BpeMerges),
      Bpe.train(Bpe.wordHistogram(Tables.documents(s, d), "text"), BpeMerges))

  /** The q90 training-replay CTE chain (tok/w/hist/seg0 … enc),
    * shared verbatim by [[bpeEncodeOracle]] and the q94 budget
    * composition — one definition, so the two oracles can never
    * disagree about what "the trained tokenizer" means. */
  private def bpeCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""tok AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), w AS MATERIALIZED (
       |  SELECT doc_id, i, toks[i] AS word
       |  FROM tok, UNNEST(range(1, len(toks) + 1)) t(i)
       |), hist AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM w GROUP BY word
       |), seg0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |    regexp_replace(word, '(.)', chr(1) || '\\1' || chr(1), 'g') AS s
       |  FROM hist
       |)""".stripMargin
    for (k <- 0 until BpeMerges) {
      sb ++= s"""
       |, p$k AS (
       |  SELECT sy[i] AS a, sy[i+1] AS b, SUM(cnt) AS n
       |  FROM (SELECT cnt, list_filter(string_split(s, chr(1)), x -> x <> '') AS sy
       |        FROM seg$k),
       |    UNNEST(range(1, len(sy))) t(i)
       |  GROUP BY 1, 2 HAVING SUM(cnt) >= 2
       |), m$k AS MATERIALIZED (
       |  SELECT a, b,
       |         chr(1) || a || chr(1) || chr(1) || b || chr(1) AS pat,
       |         chr(1) || a || b || chr(1) AS rep
       |  FROM p$k ORDER BY n DESC, a ASC, b ASC LIMIT 1
       |), seg${k + 1} AS MATERIALIZED (
       |  SELECT word, cnt,
       |    replace(s, COALESCE((SELECT pat FROM m$k), chr(2)),
       |               COALESCE((SELECT rep FROM m$k), chr(2))) AS s
       |  FROM seg$k
       |)""".stripMargin
    }
    sb ++= s"""
       |, enc AS MATERIALIZED (
       |  SELECT word,
       |    array_to_string(list_filter(string_split(s, chr(1)), x -> x <> ''), ' ') AS symstr,
       |    CAST(len(list_filter(string_split(s, chr(1)), x -> x <> '')) AS BIGINT) AS n_syms
       |  FROM seg$BpeMerges
       |)""".stripMargin
    sb.result()
  }

  def bpeEncodeOracle: String =
    s"""WITH $bpeCtes
       |SELECT t.doc_id,
       |  CAST(COUNT(w.word) AS BIGINT) AS n_words,
       |  CAST(COALESCE(SUM(enc.n_syms), 0) AS BIGINT) AS n_bpe_tokens,
       |  md5(COALESCE(string_agg(enc.symstr, ' ' ORDER BY w.i), '')) AS bpe_md5
       |FROM tok t
       |LEFT JOIN w ON w.doc_id = t.doc_id
       |LEFT JOIN enc ON enc.word = w.word
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** BPE merge table (q104): the TRAINING ARTIFACT itself on the
    * oracle surface — q90/q94 gate encode COUNTS; this gates the
    * learned merges one by one (rank, left symbol, right symbol), so
    * a tie-break or histogram drift shows up as the exact divergent
    * merge, not a downstream count mismatch. */
  def bpeMergeTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = trainedMerges(s, d)
    merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("merge_rank", "a", "b")
      .orderBy(col("merge_rank"))
  }

  def bpeMergeTableOracle: String = {
    val union = (0 until BpeMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS merge_rank, a, b FROM m$k")
      .mkString("\n  UNION ALL ")
    s"""WITH $bpeCtes
       |SELECT merge_rank, a, b FROM (
       |  $union
       |) ORDER BY merge_rank""".stripMargin
  }

  /** BPE-token budget sampling (q94): the q83 quota sampler running
    * on REAL learned subword counts — train the q90 tokenizer, count
    * each document's BPE tokens, then fill per-source quotas (src0
    * 3000 tokens, src1 1000, default 2000) in deterministic hash
    * order through the banded prefix sum. This is what "token budget"
    * means in a training pipeline: the budget is in the tokens the
    * model will actually consume, not a char/whitespace proxy. The
    * oracle replays the ENTIRE composition — BPE training (the shared
    * q90 CTE chain), encode counts, and the per-source cumsum — so
    * the gate covers tokenizer and sampler as one system. */
  def bpeTokenBudget(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = trainedMerges(s, d)
    val counts = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val withCounts = docs.select(col("doc_id"), col("source"))
      .join(counts, Seq("doc_id"))
    Packing.tokenBudgetSample(withCounts, "source", "doc_id",
        "n_bpe_tokens", Map("src0" -> 3000L, "src1" -> 1000L),
        defaultBudget = 2000L, salt = "bpetb")
      .select(col("doc_id"), col("source"), col("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  def bpeTokenBudgetOracle: String =
    s"""WITH $bpeCtes, cnt AS (
       |  SELECT t.doc_id,
       |    CAST(COALESCE(SUM(enc.n_syms), 0) AS BIGINT) AS n_bpe_tokens
       |  FROM tok t
       |  LEFT JOIN w ON w.doc_id = t.doc_id
       |  LEFT JOIN enc ON enc.word = w.word
       |  GROUP BY t.doc_id
       |), h AS (
       |  SELECT d.doc_id, d.source, c.n_bpe_tokens,
       |    substring(md5(CAST(d.doc_id AS VARCHAR) || 'bpetb'), 1, 8) AS hk
       |  FROM documents d JOIN cnt c ON c.doc_id = d.doc_id
       |), cum AS (
       |  SELECT doc_id, source, n_bpe_tokens,
       |    SUM(n_bpe_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM h
       |)
       |SELECT doc_id, source, n_bpe_tokens FROM cum
       |WHERE cum <= CASE source WHEN 'src0' THEN 3000
       |                         WHEN 'src1' THEN 1000 ELSE 2000 END
       |ORDER BY doc_id""".stripMargin

  /** Token-budget sampling (q83): per-source token quotas filled in
    * deterministic hash order — src0 gets 6000 chars, src1 2000,
    * everything else 4000. The banded prefix sum keeps the running
    * total off any single task (see [[graft.datapipe.Packing]]); the
    * oracle is the plain per-source cumulative-sum window, which must
    * select the identical prefix. */
  def tokenBudget(s: SparkSession, d: String): DataFrame =
    Packing.tokenBudgetSample(Tables.documents(s, d), "source", "doc_id",
        "n_chars", Map("src0" -> 6000L, "src1" -> 2000L),
        defaultBudget = 4000L, salt = "tb")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  def tokenBudgetOracle: String =
    """WITH h AS (
      |  SELECT doc_id, source, n_chars,
      |    substring(md5(CAST(doc_id AS VARCHAR) || 'tb'), 1, 8) AS hk
      |  FROM documents WHERE n_chars IS NOT NULL
      |), c AS (
      |  SELECT doc_id, source, n_chars,
      |    SUM(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM h
      |)
      |SELECT doc_id, source, n_chars FROM c
      |WHERE cum <= CASE source WHEN 'src0' THEN 6000
      |                         WHEN 'src1' THEN 2000 ELSE 4000 END
      |ORDER BY doc_id""".stripMargin

  /** Cross-source overlap matrix (q84): distinct shared 3-token
    * shingles per source pair — the curation diagnostic behind dedup
    * priorities and mixture double-counting. Bounded fan-out: a
    * shingle contributes at most C(nSources, 2) pairs however often
    * it repeats. Integer-exact; oracle recomputes the identical md5
    * shingle hashes. */
  def sourceOverlap(s: SparkSession, d: String): DataFrame =
    Spans.sourceOverlapMatrix(Tables.documents(s, d), "source", "text", n = 3)
      .orderBy(col("src_a"), col("src_b"))

  def sourceOverlapOracle: String =
    s"""WITH tok AS (
       |  SELECT source, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), sp AS (
       |  SELECT DISTINCT source, substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 16) AS h
       |  FROM tok, UNNEST(range(1, len(toks) - 1)) t(i)
       |  WHERE len(toks) >= 3
       |)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM sp a JOIN sp b ON a.h = b.h AND a.source < b.source
       |GROUP BY a.source, b.source
       |ORDER BY src_a, src_b""".stripMargin

  /** Exact quantiles (q85): p50/p90/p99 of lineitem price cents by
    * radix selection — 8 byte-histogram passes, no sort, no row-data
    * shuffle (see [[graft.datapipe.Quantiles]]). Cents are exact:
    * both engines compute round(price·100) on the identical parquet
    * doubles. The oracle finds the same rank via row_number; the rank
    * expression ceil(q·n) is the same IEEE arithmetic on both sides. */
  def exactQuantiles(s: SparkSession, d: String): DataFrame =
    Quantiles.exactQuantiles(
      Tables.lineitem(s, d)
        .select(round(col("l_extendedprice") * 100).cast("long").as("cents")),
      "cents", Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .orderBy(col("q"))

  def exactQuantilesOracle: String =
    """WITH v AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
      |), o AS (
      |  SELECT c, row_number() OVER (ORDER BY c) AS rn,
      |    count(*) OVER () AS n
      |  FROM v
      |)
      |SELECT q, k, cents FROM (
      |  SELECT 'p50' AS q, rn AS k, c AS cents FROM o
      |  WHERE rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))
      |  UNION ALL
      |  SELECT 'p90' AS q, rn AS k, c AS cents FROM o
      |  WHERE rn = GREATEST(1, CAST(ceil(0.9 * n) AS BIGINT))
      |  UNION ALL
      |  SELECT 'p99' AS q, rn AS k, c AS cents FROM o
      |  WHERE rn = GREATEST(1, CAST(ceil(0.99 * n) AS BIGINT))
      |) ORDER BY q""".stripMargin

  /** The q208 quantile grid — wider than q85's three points: the
    * latency-dashboard ladder a monitoring stack actually serves. */
  private val SummaryQs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
    "p90" -> 0.9, "p95" -> 0.95, "p99" -> 0.99)

  /** Quantiles from the mergeable value-count SUMMARY (q208): the
    * same exact order statistics as q85, served from the
    * dictionary-sized (value, cnt) relation the STREAMING quantile
    * state persists ([[graft.streaming.StreamingPipeline.quantileStream]])
    * — one map-side-combined count pass over the corpus, then the
    * weighted radix walk ([[Quantiles.kthSmallestCounts]]: 8
    * byte-histogram rounds whose scans touch only the summary). This
    * oracles the summary read path itself: value counts merge by
    * addition, so the summary is order/batching-insensitive by
    * construction and the streamed snapshot is spec-tied bit-equal to
    * this query. Six-point ladder (p25..p99); emits (q, k, cents). */
  def quantileSummary(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
    Quantiles.quantilesFromCounts(counts, "cents", "cnt", SummaryQs)
      .orderBy(col("q"))
  }

  def quantileSummaryOracle: String = {
    val branches = SummaryQs.map { case (label, q) =>
      s"""SELECT '$label' AS q, rn AS k, c AS cents FROM o
         |  WHERE rn = GREATEST(1, CAST(ceil($q * n) AS BIGINT))""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH v AS (
       |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
       |), o AS (
       |  SELECT c, row_number() OVER (ORDER BY c) AS rn,
       |    count(*) OVER () AS n
       |  FROM v
       |)
       |SELECT q, k, cents FROM (
       |  $branches
       |) ORDER BY q""".stripMargin
  }

  /** Composed training-data funnel (q86): the round-9 ops chained on
    * top of the q54 curation — curate (lang → quality → near-dup
    * survivors → 50% sample) → assign train/val/test bands → trim the
    * TRAIN split to a 2000-char-per-source token budget. val/test ride
    * through untrimmed (evaluation sets are never quota-cut). The
    * ENTIRE composition is recomputed by the oracle — band keys,
    * split CASE, budget cumsum — proving the operators compose without
    * any engine-specific semantics leaking between stages. */
  def curatedMix(s: SparkSession, d: String): DataFrame = {
    val curated = Curation.curate(Tables.documents(s, d), md5Based = true)
    val withSplit = Sampling.assignSplit(curated, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
    val train = Packing.tokenBudgetSample(
      withSplit.filter(col("split") === "train"), "source", "doc_id",
      "n_chars", Map.empty, defaultBudget = 2000L, salt = "tb")
    train.unionByName(withSplit.filter(col("split") =!= "train"))
      .select(col("doc_id"), col("source"), col("split"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  def curatedMixOracle: String = {
    val key = "substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)"
    s"""WITH $curationCtes, sp AS (
       |  SELECT doc_id, source, n_chars,
       |    CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM samp
       |), tr AS (
       |  SELECT doc_id,
       |    SUM(n_chars) OVER (PARTITION BY source
       |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || 'tb'), 1, 8), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM sp WHERE split = 'train' AND n_chars IS NOT NULL
       |)
       |SELECT doc_id, source, split, n_chars FROM sp
       |WHERE split <> 'train'
       |   OR doc_id IN (SELECT doc_id FROM tr WHERE cum <= 2000)
       |ORDER BY doc_id""".stripMargin
  }

  /** Stratified weighted sample (q87): 3 documents per source drawn
    * ∝ n_chars — per-stratum A-ES priorities selected by the bounded
    * double-score [[graft.datapipe.TopK]] aggregator (one keyed
    * exchange, never a per-source window sort). Float margin: per
    * source the rank-3/4 priority gap is orders above ln's cross-
    * engine ULP drift (same argument as q78, verified by the hash
    * gate at sf0.01 and sf0.1). */
  def stratifiedWeighted(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedWeightedTopK(Tables.documents(s, d), "source",
        "doc_id", "n_chars", k = 3, salt = "sw")
      .orderBy(col("source"), col("rank"))

  def stratifiedWeightedOracle: String =
    """SELECT source, rank, doc_id FROM (
      |  SELECT source, doc_id,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY
      |      ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'sw'), 1, 8) AS BIGINT) + 0.5)
      |          / 4294967296.0) / CAST(n_chars AS DOUBLE) DESC, doc_id)
      |      AS BIGINT) AS rank
      |  FROM documents WHERE n_chars > 0
      |) WHERE rank <= 3 ORDER BY source, rank""".stripMargin

  /** Split-leakage audit (q88): near-duplicate pairs that STRADDLE
    * the train/eval boundary — the eval-hygiene check a split manifest
    * must pass (a test doc with a train near-dup inflates eval).
    * Composition: the q13 exact-verified LSH pairs joined to the q77
    * split assignment, keeping pairs whose sides land in different
    * splits. Hash-band splits make this auditable BEFORE training;
    * the oracle recomputes pairs AND assignment. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupOps.minhashNearDupPairs(Tables.documents(s, d),
      minJaccard = 0.5, md5Based = true)
    val splits = Sampling.assignSplit(Tables.documents(s, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .select(col("doc_id"), col("split"))
    pairs
      .join(splits.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), Seq("id_a"))
      .join(splits.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def splitLeakageOracle: String = {
    val key = "substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)"
    s"""WITH ${minhashPairsCtes("documents")}, np AS (
       |  SELECT id_a, id_b FROM pairs
       |  WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |), sp AS (
       |  SELECT doc_id,
       |    CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |)
       |SELECT p.id_a, p.id_b, a.split AS split_a, b.split AS split_b
       |FROM np p
       |JOIN sp a ON a.doc_id = p.id_a
       |JOIN sp b ON b.doc_id = p.id_b
       |WHERE a.split <> b.split
       |ORDER BY p.id_a, p.id_b""".stripMargin
  }

  /** Leakage-FREE split (q101): the action that fixes what q88
    * audits. Split assignment hashes the near-dup COMPONENT id (q55's
    * transitive closure), not the doc id — every member of a near-dup
    * cluster shares its component's hash, so no near-dup pair can
    * straddle train/val/test BY CONSTRUCTION (the q88 audit returns
    * zero rows on this assignment; spec-asserted). Singletons hash
    * their own id, so the non-duplicated mass keeps the usual
    * proportions. */
  def leakFreeSplit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = DedupOps.minhashNearDupPairs(docs, minJaccard = 0.5,
        md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    val comp = ConnectedComponents.componentsWithSingletons(docs, "doc_id", pairs)
    Sampling.assignSplit(comp, "component",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .select(col("doc_id"), col("component"), col("split"))
      .orderBy(col("doc_id"))
  }

  def leakFreeSplitOracle: String = {
    val key = "substring(md5(CAST(component AS VARCHAR) || 'split'), 1, 8)"
    s"""WITH RECURSIVE ${minhashPairsCtes("documents")}, edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |  UNION ALL
       |  SELECT id_b AS a, id_a AS b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |), reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
       |), comp AS (
       |  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
       |)
       |SELECT doc_id, component,
       |  CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |       WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM comp ORDER BY doc_id""".stripMargin
  }

  /** The full LLM-curation funnel (q103) — the capstone composition:
    * every stage of a production training-data pipeline chained from
    * this package's verified operators, and the ENTIRE six-stage
    * composition recomputed by one DuckDB oracle:
    *
    *  1. language gate + quality gate (the q54 predicates);
    *  2. decontamination vs the held-out eval slice (doc_id ≡ 0
    *     mod 97; ≥ 2 shared 3-gram shingles removes — q98);
    *  3. fuzzy dedup: md5-portable minhash survivors (q13/q54);
    *  4. semantic dedup under the GLOBAL q95 k-means model: among the
    *     remaining docs' embeddings, drop the larger id of every
    *     same-cluster cosine pair ≥ 0.45 (q96); docs without an
    *     embedding skip this stage (cluster −1);
    *  5. leak-free split: the cosine pairs STILL standing among the
    *     final survivors (cross-cluster near-dups stage 4 deliberately
    *     keeps) define the component graph, and the split hashes the
    *     component id (q101) — so nothing that survived dedup can
    *     straddle train/val/test;
    *  6. publish (doc_id, cluster, component, split).
    *
    * The two expensive stage boundaries — the dedup survivor set and
    * the cosine pair set — are MATERIALIZED eagerly (localCheckpoint,
    * the same idiom [[ConnectedComponents]] uses between star rounds):
    * both feed several downstream consumers (the quantizer's cache
    * fill, both chunk-join sides, and the component loop's
    * count + solve), and without a cut each consumer would re-execute
    * the whole gate→decontaminate→minhash chain, compounding a
    * sum-of-stages query into a product. Blocks are reclaimed by the
    * ContextCleaner once the result set goes unreachable; on a real
    * cluster the same cut points take a reliable checkpoint dir.
    */
  def llmFunnel(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val gated = docs.filter(col("lang") === "en")
    val okIds = QualityScore.metrics(gated)
      .filter(col("n_tokens") >= 30 &&
        col("n_punct") < lit(0.2) * col("n_chars_measured"))
      .select(col("doc_id"))
    val qual = gated.join(okIds, Seq("doc_id"), "left_semi")
    // decon is materialized BEFORE the dedup stage (round 18): the
    // survivor computation consumes its input four times (candidate
    // banding, both sides of the text re-join, and the anti-join left
    // side), so an uncut gate→decontaminate chain executed 4× here —
    // the funnel's largest hidden multiplier.
    val decon = Contamination.decontaminate(
      qual.filter(col("doc_id") % 97 =!= 0),
      qual.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 3, minShared = 2L)
      .localCheckpoint(true)
    // id-only survivor cut (round 18): everything downstream of the
    // dedup stage keys on doc_id alone, so the barrier materializes
    // ids, not document texts — same rows out, smaller blocks
    val surv = DedupOps.minhashDedupSurvivors(decon, minJaccard = 0.5,
        md5Based = true)
      .select(col("doc_id"))
      .localCheckpoint(true)

    val emb = Tables.embeddings(s, d)
    val assign = Clustering.kmeansAssign(emb, k = KmK, iters = KmIters)
      .select(col("vec_id"), col("cluster"))
    val embSurv = emb.join(surv.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val nCells = math.max(8, math.sqrt(embSurv.count().toDouble).toInt)
    val cosPairs = Similarity.cosineNearDupPairs(embSurv, threshold = 0.45,
        nCells = nCells)
      .localCheckpoint(true)
    val sameCluster = cosPairs
      .join(assign.withColumnRenamed("vec_id", "id_a")
        .withColumnRenamed("cluster", "cl_a"), Seq("id_a"))
      .join(assign.withColumnRenamed("vec_id", "id_b")
        .withColumnRenamed("cluster", "cl_b"), Seq("id_b"))
      .filter(col("cl_a") === col("cl_b"))
    val removed = sameCluster.select(col("id_b").as("doc_id")).distinct()
    val fin = surv.join(removed, Seq("doc_id"), "left_anti")

    val finIds = fin.select(col("doc_id"))
    val finPairs = cosPairs
      .join(finIds.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
      .join(finIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
      .select(col("id_a").as("u"), col("id_b").as("v"))
    val comp = ConnectedComponents.componentsWithSingletons(fin, "doc_id", finPairs)
    Sampling.assignSplit(comp, "component",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .join(assign.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster"), lit(-1L)).as("cluster"),
        col("component"), col("split"))
      .orderBy(col("doc_id"))
  }

  def llmFunnelOracle: String = {
    val key = "substring(md5(CAST(component AS VARCHAR) || 'split'), 1, 8)"
    s"""WITH RECURSIVE gated AS (
       |  SELECT * FROM documents WHERE lang = 'en' AND length(trim(text)) > 0
       |), qual AS (
       |  SELECT * FROM gated
       |  WHERE len(string_split_regex(trim(text), '${Tok.WS}')) >= 30
       |    AND (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
       |        < 0.2 * length(text)
       |), ctok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM qual
       |), csh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
       |  FROM ctok
       |), eval_sh AS (
       |  SELECT DISTINCT unnest(sh) AS s FROM csh WHERE doc_id % 97 = 0
       |), flagged AS (
       |  SELECT t.doc_id FROM (
       |    SELECT doc_id, unnest(sh) AS s FROM csh WHERE doc_id % 97 <> 0) t
       |  JOIN eval_sh e ON t.s = e.s
       |  GROUP BY t.doc_id HAVING COUNT(*) >= 2
       |), decon AS (
       |  SELECT * FROM qual
       |  WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
       |), ${minhashPairsCtes("decon")}, surv AS (
       |  SELECT doc_id FROM decon WHERE doc_id NOT IN (
       |    SELECT id_b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter))
       |), $kmeansCtes, pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE a.vec_id IN (SELECT doc_id FROM surv)
       |    AND b.vec_id IN (SELECT doc_id FROM surv)
       |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
       |), removed AS (
       |  SELECT DISTINCT p.id_b AS doc_id
       |  FROM pr p
       |  JOIN af x ON x.vec_id = p.id_a
       |  JOIN af y ON y.vec_id = p.id_b
       |  WHERE x.cluster = y.cluster
       |), fin AS (
       |  SELECT doc_id FROM surv
       |  WHERE doc_id NOT IN (SELECT doc_id FROM removed)
       |), fedges AS (
       |  SELECT id_a AS a, id_b AS b FROM pr
       |  WHERE id_a IN (SELECT doc_id FROM fin) AND id_b IN (SELECT doc_id FROM fin)
       |  UNION ALL
       |  SELECT id_b AS a, id_a AS b FROM pr
       |  WHERE id_a IN (SELECT doc_id FROM fin) AND id_b IN (SELECT doc_id FROM fin)
       |), reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM fin
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN fedges e ON e.a = r.node
       |), comp AS (
       |  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
       |)
       |SELECT c.doc_id,
       |  COALESCE(af.cluster, -1) AS cluster,
       |  c.component,
       |  CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |       WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM comp c LEFT JOIN af ON af.vec_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin
  }

  /** Dataset card (q102): the per-source summary panel a curation run
    * publishes — doc/char/token mass, language spread, and near-dup
    * incidence (docs participating in any exact-verified q13 pair),
    * all integer-exact. One scan for the base stats + the q13 pair
    * chain for the dup column; the oracle recomputes BOTH. */
  def datasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(size(filter(split(lower(col("text")), Tok.WS), t => t =!= "")))
        .as("total_tokens"),
      countDistinct(col("lang")).as("n_langs"))
    val pairIds = DedupOps.minhashNearDupPairs(docs, minJaccard = 0.5,
        md5Based = true)
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    val dup = docs.join(pairIds, Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("__nd"))
    base.join(dup, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("total_tokens"), col("n_langs"),
        coalesce(col("__nd"), lit(0L)).as("n_neardup_docs"))
      .orderBy(col("source"))
  }

  def datasetCardOracle: String =
    s"""WITH ${minhashPairsCtes("documents")}, np AS (
       |  SELECT id_a, id_b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |), ids AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT id_a AS doc_id FROM np UNION ALL SELECT id_b AS doc_id FROM np)
       |), base AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    CAST(sum(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> ''))) AS BIGINT) AS total_tokens,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       |  FROM documents GROUP BY source
       |), dup AS (
       |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_neardup_docs
       |  FROM documents d JOIN ids ON ids.doc_id = d.doc_id GROUP BY d.source
       |)
       |SELECT b.source, b.n_docs, b.total_chars, b.total_tokens, b.n_langs,
       |  COALESCE(dup.n_neardup_docs, 0) AS n_neardup_docs
       |FROM base b LEFT JOIN dup ON dup.source = b.source
       |ORDER BY b.source""".stripMargin

  /** Near-dup clusters (q55): transitive closure of the minhash
    * near-dup pairs via large-star/small-star connected components —
    * every document labeled with the min doc_id of its cluster,
    * singletons labeling themselves. Oracle: DuckDB recomputes the
    * exact pair set and closes it with a recursive CTE. */
  def nearDupComponents(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = DedupOps.minhashNearDupPairs(docs, minJaccard = 0.5,
        md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    ConnectedComponents.componentsWithSingletons(docs, "doc_id", pairs)
      .orderBy(col("doc_id"))
  }

  /** Shared oracle CTE chain mirroring [[graft.datapipe.Hashing.minhashBandsMd5]]
    * + [[graft.datapipe.DedupOps.minhashCandidates]] over `srcRel`
    * (any relation with doc_id, text): the 32×4 LSH band keys are
    * recomputed bit-for-bit in DuckDB (md5_number_lower == the
    * engine's md5Low64; the (a·x + b) mod 2^61−1 permutations fit
    * HUGEINT exactly; identical a/b constants are generated from the
    * same Scala functions), candidate pairs come from band-key
    * equality with the engine's [2, maxBucket=64] bucket-size gate,
    * and `pairs` carries exact-Jaccard counts for CANDIDATES ONLY.
    * Oracle and engine therefore test the SAME candidate set — a
    * borderline pair (J ≈ 0.5) that escapes banding escapes both
    * engines identically, so correctness no longer assumes total LSH
    * recall. */
  /** The tok → sh → signature → band-key → banded chain alone (shared
    * by [[minhashPairsCtes]] and the q75 incremental oracle). */
  /** tok → sh → xs → sig: the 128-minimum md5 MinHash signature chain
    * (config-independent — band grouping happens downstream). */
  private def minhashSigCtes(srcRel: String): String = {
    val p = "2305843009213693951::HUGEINT" // 2^61 - 1
    val sigCols = (0 until DedupOps.NumPerm).map { i =>
      s"list_min(list_transform(xs, x -> (${Hashing.permA(i)}::HUGEINT * x + ${Hashing.permB(i)}::HUGEINT) % $p)) AS m$i"
    }.mkString(",\n    ")
    s"""tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
      |  FROM $srcRel
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
      |  FROM tok WHERE len(toks) > 0
      |), xs AS (
      |  SELECT doc_id, list_transform(sh, s -> md5_number_lower(s)::HUGEINT % $p) AS xs FROM sh
      |), sig AS MATERIALIZED (
      |  SELECT doc_id,
      |    $sigCols
      |  FROM xs
      |)""".stripMargin
  }

  /** bkeys/banded for a given band count over `sig` (rows =
    * NumPerm/bands); `sfx` suffixes the CTE names so several configs
    * coexist in one statement (q158). */
  private def bandedCtesFor(bands: Int, sfx: String): String = {
    val rows = DedupOps.NumPerm / bands
    val keyList = (0 until bands).map { b =>
      (0 until rows).map(r => s"m${b * rows + r}").mkString("concat(", ", ',', ", ")")
    }.mkString("[", ",\n    ", "]")
    s"""bkeys$sfx AS (
      |  SELECT doc_id,
      |    $keyList AS ks
      |  FROM sig
      |), banded$sfx AS (
      |  SELECT doc_id, band_idx, ks[band_idx + 1] AS band_key
      |  FROM bkeys$sfx, (SELECT unnest(range($bands)) AS band_idx) bi
      |)""".stripMargin
  }

  private def minhashBandedCtes(srcRel: String): String =
    s"""${minhashSigCtes(srcRel)}, ${bandedCtesFor(DedupOps.Bands, "")}""".stripMargin

  private[queries] def minhashPairsCtes(srcRel: String): String = {
    s"""${minhashBandedCtes(srcRel)}, bsz AS (
      |  SELECT band_idx, band_key, count(*) AS n FROM banded GROUP BY band_idx, band_key
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM banded x
      |  JOIN banded y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
      |    AND x.doc_id < y.doc_id
      |  JOIN bsz z ON z.band_idx = x.band_idx AND z.band_key = x.band_key
      |  WHERE z.n BETWEEN 2 AND 64
      |), pairs AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
      |    CAST(len(a.sh) + len(b.sh) AS BIGINT) AS sum_len
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b
      |)""".stripMargin
  }

  /** Oracle for q55: the mirrored candidate pairs ([[minhashPairsCtes]])
    * thresholded, closed transitively with a recursive CTE. */
  def componentsOracle: String =
    s"""WITH RECURSIVE ${minhashPairsCtes("documents")}, edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
      |  UNION ALL
      |  SELECT id_b AS a, id_a AS b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
      |), reach(node, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
      |)
      |SELECT node AS doc_id, MIN(label) AS component
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** Composed curation funnel (q54): language gate → quality gate →
    * minhash near-dup survivors → 50% deterministic sample, with the
    * whole composition recomputed by the DuckDB oracle, including the
    * mirrored LSH candidate set ([[minhashPairsCtes]] over the
    * quality-gated subset). */
  def curationFunnel(s: SparkSession, d: String): DataFrame =
    Curation.curate(Tables.documents(s, d), md5Based = true)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** The q54 curation chain as reusable CTE text ending in `samp`
    * (lang gate → quality gate → minhash survivors → 50% sample) —
    * shared by [[curationOracle]] and the q86 composition oracle. */
  private def curationCtes: String =
    s"""gated AS (
      |  SELECT * FROM documents WHERE lang = 'en' AND length(trim(text)) > 0
      |), qual AS (
      |  SELECT * FROM gated
      |  WHERE len(string_split_regex(trim(text), '${Tok.WS}')) >= 30
      |    AND (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
      |        < 0.2 * length(text)
      |), ${minhashPairsCtes("qual")}, surv AS (
      |  SELECT * FROM qual WHERE doc_id NOT IN (
      |    SELECT id_b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter))
      |), samp AS (
      |  SELECT * FROM surv
      |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
      |)""".stripMargin

  def curationOracle: String =
    s"""WITH $curationCtes
      |SELECT doc_id, lang, n_chars FROM samp
      |ORDER BY doc_id""".stripMargin

  /** Cohort retention matrix (q152): users grouped by first-activity
    * day, tracked across every day they stay active (the events table
    * spans one month, so DAY is its natural cohort granularity) — the
    * product-analytics staple, and at corpus scale the same shape as
    * "documents by ingestion batch × re-crawl survival". Exact SQL on
    * both engines: distinct (user, month) activity ⋈ the min-month
    * cohort assignment, counted per (cohort, month); retention is an
    * exact ×2¹⁰ truncating ratio. All joins/aggs key on user_id or
    * the tiny (cohort, month) pair — two user-keyed shuffles total,
    * partial aggs everywhere; at 100 TB this is the canonical
    * two-pass "first-touch then fan back" plan. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("m"))
    val firstM = ev.groupBy(col("user_id")).agg(min(col("m")).as("cohort"))
    val act = ev.distinct()
    val na = act.join(firstM, "user_id")
      .groupBy(col("cohort"), col("m"))
      .agg(count(lit(1)).as("n_active"))
    val cs = firstM.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    na.join(cs, "cohort")
      .select(col("cohort"), col("m").as("active_day"), col("n_active"),
        col("cohort_size"),
        expr("(n_active * 1024) div cohort_size").as("retention_fp"))
      .orderBy(col("cohort"), col("active_day"))
  }

  def cohortRetentionOracle: String =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS m
       |  FROM events WHERE user_id IS NOT NULL
       |), fm AS MATERIALIZED (
       |  SELECT user_id, MIN(m) AS cohort FROM ev GROUP BY user_id
       |), act AS MATERIALIZED (
       |  SELECT DISTINCT user_id, m FROM ev
       |), na AS (
       |  SELECT f.cohort, a.m, CAST(count(*) AS BIGINT) AS n_active
       |  FROM act a JOIN fm f ON f.user_id = a.user_id
       |  GROUP BY f.cohort, a.m
       |), cs AS (
       |  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
       |  FROM fm GROUP BY cohort
       |)
       |SELECT na.cohort, na.m AS active_day, na.n_active, cs.cohort_size,
       |  (na.n_active * 1024) // cs.cohort_size AS retention_fp
       |FROM na JOIN cs ON cs.cohort = na.cohort
       |ORDER BY na.cohort, active_day""".stripMargin

  /** Gaps-and-islands sessionization over the events stream table
    * (30-minute inactivity gap), summarized per session. */
  def sessionize(s: SparkSession, d: String): DataFrame =
    Sessionize.sessionStats(Tables.events(s, d), "user_id", "ts",
        "event_id", gapSeconds = 1800L)
      .orderBy(col("user_id"), col("session_id"))

  def dictionaryJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.experimental.extraStrategies =
      Seq(graft.plans.DictionaryJoinStrategy)
    val vocab = dictSurfaces.toDF("surface")
    Tables.documents(s, d)
      .join(vocab, expr("contains(text, surface)"))
      .select(col("doc_id"), col("surface"))
      .orderBy(col("doc_id"), col("surface"))
  }

  def dictionaryJoinOracle: String = {
    val values = dictSurfaces.map(w => s"('$w')").mkString(", ")
    s"""SELECT d.doc_id, v.surface
       |FROM documents d JOIN (VALUES $values) v(surface)
       |  ON contains(d.text, v.surface)
       |ORDER BY d.doc_id, v.surface""".stripMargin
  }

  /** Contains-dictionary SEMI join (EXISTS filter — "keep documents
    * mentioning any surface"), planned through the same strategy as
    * q26 but emitting each document once. */
  def dictionarySemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.experimental.extraStrategies =
      Seq(graft.plans.DictionaryJoinStrategy)
    val vocab = dictSurfaces.toDF("surface")
    Tables.documents(s, d)
      .join(vocab, expr("contains(text, surface)"), "left_semi")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  def dictionarySemiJoinOracle: String = {
    val values = dictSurfaces.map(w => s"('$w')").mkString(", ")
    s"""SELECT d.doc_id FROM documents d
       |WHERE EXISTS (SELECT 1 FROM (VALUES $values) v(surface)
       |              WHERE contains(d.text, v.surface))
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB oracle for dedupMinhash (q13): the mirrored LSH candidate
    * set ([[minhashPairsCtes]]) verified with exact 3-gram word-shingle
    * Jaccard — the identical candidate-then-verify computation the
    * engine runs, so no recall assumption. Counts (not a float ratio)
    * are compared, and the threshold predicate is the same exact
    * integer test both engines evaluate. */
  def minhashOracle: String =
    s"""WITH ${minhashPairsCtes("documents")}
      |SELECT id_a, id_b, n_inter, sum_len - n_inter AS n_union
      |FROM pairs
      |WHERE n_inter >= 0.5 * (sum_len - n_inter)
      |ORDER BY id_a, id_b""".stripMargin

  /** q91 literal non-ASCII corpus — shared VERBATIM between the engine
    * DataFrame and the oracle VALUES list: lowercase Cyrillic, CJK,
    * Latin-1 BMP, and astral-plane emoji token stems (lower() is
    * identity on all of them, so case folding cannot diverge). Docs
    * 1/2, 3/4, 5/6 are planted near-dup pairs (32 of 40 shared
    * tokens, J ≈ 0.65); 7 and 8 are unpaired. */
  private def naToks(stem: String, seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"$stem${seed * 100 + i}")

  private val nonAsciiDocs: Seq[(Long, String)] = Seq(
    1L -> naToks("ки", 1, 40),
    2L -> (naToks("ки", 1, 32) ++ naToks("ки", 9, 8)),
    3L -> naToks("中", 3, 40),
    4L -> (naToks("中", 3, 32) ++ naToks("中", 8, 8)),
    5L -> naToks("😀", 5, 40),
    6L -> (naToks("😀", 5, 32) ++ naToks("😀", 7, 8)),
    7L -> naToks("é", 6, 40),
    8L -> (naToks("ки", 2, 20) ++ naToks("中", 2, 10) ++ naToks("😀", 2, 10))
  ).map { case (id, ts) => (id, ts.mkString(" ")) }

  /** Non-ASCII minhash fidelity (q91): the FNV fast-path LSH chain —
    * fnv64 tokens → mix64 shingle fold → 128-perm signature → 32 band
    * keys → bucketed candidates → exact-Jaccard verify — run on the
    * literal non-ASCII corpus above and oracled by the full
    * [[MinhashMirrorSql]] HUGEINT mirror over the same literals.
    * Closes the round-9 fidelity loophole: fnv64 folds CODEPOINTS on
    * both engines now (HashingFidelitySpec pins the convention), so
    * the mirror is driver-verified for BMP and astral text every
    * round instead of assumed for ASCII. */
  def nonAsciiMinhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    DedupOps.minhashNearDupPairs(nonAsciiDocs.toDF("doc_id", "text"),
      minJaccard = 0.5)
  }

  def nonAsciiMinhashOracle: String = {
    val values = nonAsciiDocs
      .map { case (id, t) => s"($id, '$t')" }.mkString(",\n      |    ")
    s"""WITH nacorp AS (
      |  SELECT * FROM (VALUES
      |    $values) AS t(doc_id, text)
      |), ${MinhashMirrorSql.tokCte("nacorp")},
      |${MinhashMirrorSql.candidateCtes("mh_tok")}, jsh AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |    ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
      |  FROM mh_tok WHERE len(toks) > 0
      |), napairs AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
      |    CAST(len(a.sh) + len(b.sh) AS BIGINT) AS sum_len
      |  FROM mh_cand c
      |  JOIN jsh a ON a.doc_id = c.id_a
      |  JOIN jsh b ON b.doc_id = c.id_b
      |)
      |SELECT id_a, id_b, n_inter, sum_len - n_inter AS n_union
      |FROM napairs
      |WHERE n_inter >= 0.5 * (sum_len - n_inter)
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB oracle for dedupSimhash (q14): recomputes the md5-based
    * simhash (token hash = md5_number_lower, exactly
    * Hashing.simhashMd5) with 64 generated bit-majority sums, then
    * brute-force hamming pairs. The Spark side's pigeonhole blocking is
    * exact (no false negatives), so blocked == brute force. */
  def simhashOracle(maxHamming: Int = 3): String = {
    val bitsSum = (0 until 64)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n    ")
    val bitsVal = (0 until 64)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${java.lang.Long.toUnsignedString(1L << b)}::UBIGINT ELSE 0::UBIGINT END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS t
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, md5_number_lower(t) AS h FROM tok
       |), acc AS (
       |  SELECT doc_id, $bitsSum FROM h GROUP BY doc_id
       |), sim AS (
       |  SELECT d.doc_id, COALESCE($bitsVal, 0::UBIGINT) AS sh
       |  FROM documents d LEFT JOIN acc a ON d.doc_id = a.doc_id
       |  WHERE d.text IS NOT NULL
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB oracle for fingerprints (q19): the same winnowing — 4-token
    * shingles hashed to their md5's first 16 hex chars (fixed-width hex
    * compares lexicographically == numerically), min per window of 8,
    * deduped, exploded to scalar rows. */
  def winnowOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) < 4 THEN [substr(md5(array_to_string(toks, ' ')), 1, 16)]
      |      ELSE list_transform(range(1, len(toks) - 2), i -> substr(md5(array_to_string(toks[i:i+3], ' ')), 1, 16)) END AS hs
      |  FROM tok WHERE len(toks) > 0
      |), wins AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) <= 8 THEN [list_min(hs)]
      |      ELSE list_distinct(list_transform(range(1, len(hs) - 6), w -> list_min(hs[w:w+7]))) END AS fps
      |  FROM sh
      |)
      |SELECT doc_id, unnest(fps) AS fp FROM wins ORDER BY doc_id, fp""".stripMargin

  /** DuckDB oracle for cosineNearDup (q20): brute-force all-pairs
    * cosine in double precision. Engine float agreement is safe by
    * margin: the nearest pair sim to the 0.45 threshold is ≥ 1e-4 away
    * and the nearest to a 4-decimal rounding boundary ≥ 2e-5, vs
    * cross-engine drift ~1e-13. */
  def cosinePairsOracle(threshold: Double = 0.45): String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** DuckDB oracle for textQuality, generated so the stopword list is
    * identical to the Spark side (StopWords.glasgow). */
  def textQualityOracle: String = {
    val stopList = StopWords.glasgow.toSeq.sorted
      .map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")
    s"""SELECT doc_id,
       | CAST(length(text) AS BIGINT) AS n_chars_measured,
       | CAST(len(string_split_regex(trim(text), '${Tok.WS}')) AS BIGINT) AS n_tokens,
       | CAST(len(list_filter(string_split_regex(trim(text), '${Tok.WS}'),
       |     t -> list_contains($stopList, lower(t)))) AS BIGINT) AS n_stopwords,
       | CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
       | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
       | CAST(len(list_filter(string_split_regex(trim(text), '${Tok.WS}'),
       |     t -> length(t) > 15)) AS BIGINT) AS n_long_tokens
       |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin
  }

  private val KmK = 8
  private val KmIters = 3

  /** Deterministic k-means cluster assignment (q95): 3 Lloyd rounds
    * over the fixed-point-quantized embeddings, k = 8, init = the 8
    * smallest vec_ids. Integer arithmetic end-to-end, so the DuckDB
    * oracle replays the ENTIRE training loop bit-for-bit. */
  def kmeans(s: SparkSession, d: String): DataFrame =
    Clustering.kmeansAssign(Tables.embeddings(s, d), k = KmK, iters = KmIters)
      .orderBy(col("vec_id"))

  /** The q95/q96 shared k-means replay CTE chain (q → qe → c0 →
    * a1/c1 … → af): quantize, init, `KmIters` unrolled Lloyd rounds
    * (assignment = per-(vec, cluster) integer distance + lowest-index
    * argmin; update = exact sums + positive-mod floor division ≡
    * `Math.floorDiv`; emptied clusters keep their previous centroid),
    * final assignment `af` under the post-update centroids. One
    * definition shared by both oracles, so the clustering the
    * SemDeDup gate replays is exactly the q95 clustering. */
  private def kmeansCtes: String = kmeansCtesFrom("embeddings")

  /** Same chain, seeded from any (vec_id, embedding) relation — the
    * q105 oracle feeds it a TEXT-DERIVED embedding CTE. */
  private def kmeansCtesFrom(src: String): String = {
    val sb = new StringBuilder
    sb ++= s"""q AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${Clustering.Fp}) AS BIGINT)) AS qv
       |  FROM $src
       |), qe AS MATERIALIZED (
       |  SELECT vec_id, unnest(qv) AS comp, generate_subscripts(qv, 1) - 1 AS pos FROM q
       |), c0 AS MATERIALIZED (
       |  SELECT CAST(s.rn - 1 AS BIGINT) AS cl, qe.pos, qe.comp
       |  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
       |        FROM q ORDER BY vec_id LIMIT $KmK) s
       |  JOIN qe ON qe.vec_id = s.vec_id
       |)""".stripMargin
    def assignSql(prev: String): String =
      s"""    SELECT dd.vec_id, dd.cl, dd.dist,
         |      row_number() OVER (PARTITION BY dd.vec_id ORDER BY dd.dist, dd.cl) AS rn
         |    FROM (SELECT qe.vec_id, c.cl, SUM((qe.comp - c.comp)*(qe.comp - c.comp)) AS dist
         |          FROM qe JOIN $prev c ON c.pos = qe.pos GROUP BY 1, 2) dd""".stripMargin
    for (i <- 1 to KmIters) {
      sb ++= s""", a$i AS MATERIALIZED (
         |  SELECT vec_id, cl FROM (
         |${assignSql(s"c${i - 1}")})
         |  WHERE rn = 1
         |), c$i AS MATERIALIZED (
         |  SELECT cl, pos, (s - ((s % n) + n) % n) // n AS comp FROM (
         |    SELECT a.cl, qe.pos, SUM(qe.comp) AS s, COUNT(*) AS n
         |    FROM a$i a JOIN qe ON qe.vec_id = a.vec_id GROUP BY 1, 2) t
         |  UNION ALL
         |  SELECT cl, pos, comp FROM c${i - 1}
         |  WHERE cl NOT IN (SELECT DISTINCT cl FROM a$i)
         |)""".stripMargin
    }
    sb ++= s""", af AS MATERIALIZED (
       |  SELECT vec_id, cl AS cluster, CAST(dist AS BIGINT) AS sq_dist FROM (
       |${assignSql(s"c$KmIters")})
       |  WHERE rn = 1
       |)""".stripMargin
    sb.result()
  }

  def kmeansOracle: String =
    s"""WITH $kmeansCtes
       |SELECT vec_id, cluster, sq_dist FROM af ORDER BY vec_id""".stripMargin

  /** SemDeDup (q96): drop every vector with a SAME-CLUSTER cosine
    * neighbor (sim ≥ 0.45, the q20 threshold with its documented
    * cross-engine margin) of smaller id; survivors keep their q95
    * cluster. The oracle replays k-means training AND the brute-force
    * same-cluster pair gate. */
  def semanticDedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val nCells = math.max(8, math.sqrt(emb.count().toDouble).toInt)
    Clustering.semanticDedupSurvivors(emb, threshold = 0.45,
        k = KmK, iters = KmIters, nCells = nCells)
      .orderBy(col("vec_id"))
  }

  def semanticDedupOracle: String =
    s"""WITH $kmeansCtes, pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
       |), rem AS (
       |  SELECT DISTINCT p.id_b AS vec_id
       |  FROM pr p
       |  JOIN af x ON x.vec_id = p.id_a
       |  JOIN af y ON y.vec_id = p.id_b
       |  WHERE x.cluster = y.cluster
       |)
       |SELECT af.vec_id, af.cluster FROM af
       |WHERE af.vec_id NOT IN (SELECT vec_id FROM rem)
       |ORDER BY af.vec_id""".stripMargin

  /** Text featurizer → k-means (q105): the q95 clustering shape
    * running on embeddings DERIVED FROM TEXT by the deterministic
    * hashed char-3-gram projection ([[Featurize]], 32 buckets) — the
    * proof that the semantic path needs no model-produced embedding
    * column. The oracle recomputes the projection ARITHMETICALLY
    * (codepoint 3-grams → fnv64 mod 32 → counts → c/√Σc² rounded to
    * float) and then replays the full fixed-point Lloyd chain on the
    * computed vectors, so a single bit of divergence in either the
    * featurizer or the clustering flips the hash. */
  def textFeaturizeKmeans(s: SparkSession, d: String): DataFrame =
    Clustering.kmeansAssign(
        Featurize.embedDocuments(Tables.documents(s, d), "doc_id", "text",
          dim = FeatDim, n = 3),
        k = KmK, iters = KmIters)
      .orderBy(col("vec_id"))

  private val FeatDim = 32

  def textFeaturizeKmeansOracle: String = {
    val femb =
      s"""flow AS (
         |  SELECT doc_id, lower(text) AS t FROM documents
         |), fg AS (
         |  SELECT doc_id, CASE
         |    WHEN t IS NULL OR length(t) = 0 THEN []
         |    WHEN length(t) < 3 THEN [t]
         |    ELSE list_transform(range(1, length(t) - 1), gi -> t[gi:gi+2])
         |    END AS grams
         |  FROM flow
         |), fgx AS (
         |  SELECT doc_id, unnest(grams) AS gram FROM fg
         |), fcnt AS (
         |  SELECT doc_id, CAST(${MinhashMirrorSql.fnvSql("gram")} % $FeatDim AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM fgx GROUP BY 1, 2
         |), fful AS (
         |  SELECT d.doc_id, b.bucket, COALESCE(fcnt.c, 0) AS c
         |  FROM (SELECT doc_id FROM documents) d
         |  CROSS JOIN (SELECT unnest(range(0, $FeatDim)) AS bucket) b
         |  LEFT JOIN fcnt ON fcnt.doc_id = d.doc_id AND fcnt.bucket = b.bucket
         |), fs AS (
         |  SELECT doc_id, SUM(c * c) AS s2 FROM fful GROUP BY doc_id
         |), femb AS (
         |  SELECT f.doc_id AS vec_id,
         |    list_transform(list(f.c ORDER BY f.bucket),
         |      fc -> CASE WHEN s.s2 = 0 THEN CAST(0 AS REAL)
         |            ELSE CAST(CAST(fc AS DOUBLE) / sqrt(CAST(s.s2 AS DOUBLE)) AS REAL) END) AS embedding
         |  FROM fful f JOIN fs s USING (doc_id)
         |  GROUP BY f.doc_id, s.s2
         |)""".stripMargin
    s"""WITH $femb, ${kmeansCtesFrom("femb")}
       |SELECT vec_id, cluster, sq_dist FROM af ORDER BY vec_id""".stripMargin
  }

  /** PCA exact moment buffer (q106): the DISTRIBUTED half of
    * [[Embeddings.pcaProject]] — the fixed-point integer moment
    * accumulation [n, s_0..s_{d-1}, upper-tri Σf_i·f_j, max|f|] — as
    * (slot, val) rows. This is the part of PCA that touches all 100 TB
    * (one map-side-combined aggregate; the d×d eigensolve on top is
    * driver-trivial and stays spec-pinned). The oracle recomputes
    * every slot INDEPENDENTLY from the raw floats — quantize, sum,
    * pair-product sum via self-join — not by replaying the engine's
    * procedure, so it pins both the arithmetic (Math.round ≡
    * floor(x·2²⁰+0.5)) and the buffer layout. */
  def pcaMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d).select(col("embedding")).as[Seq[Float]]
      .select(new Embeddings.MomentsAgg(EmbDim).toColumn.name("m"))
      .select(posexplode(col("m")).as(Seq("slot", "val")))
      .orderBy(col("slot"))
  }

  private val EmbDim = 64

  def pcaMomentsOracle: String = {
    val d = EmbDim
    val pairBase = 1 + d // first pair slot; maxSlot = 1+d+d(d+1)/2
    val maxSlot = 1 + d + d * (d + 1) / 2
    s"""WITH f AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * ${Embeddings.Fp} + 0.5) AS BIGINT) AS f
       |  FROM embeddings
       |), pieces AS (
       |  SELECT 0 AS slot, CAST(count(*) AS BIGINT) AS val FROM embeddings
       |  UNION ALL
       |  SELECT 1 + CAST(i AS INTEGER), CAST(SUM(f) AS BIGINT) FROM f GROUP BY i
       |  UNION ALL
       |  SELECT CAST($pairBase + a.i * $d - (a.i * (a.i - 1)) / 2 + (b.i - a.i) AS INTEGER),
       |    CAST(SUM(a.f * b.f) AS BIGINT)
       |  FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY a.i, b.i
       |  UNION ALL
       |  SELECT $maxSlot, CAST(MAX(ABS(f)) AS BIGINT) FROM f
       |)
       |SELECT CAST(slot AS INTEGER) AS slot, val FROM pieces ORDER BY slot""".stripMargin
  }

  /** 64 steps: the test corpora's spectral gap is λ2/λ1 ≈ 0.93, so
    * the Rayleigh deficit shrinks ~0.93^(2T) — 64 steps puts it at
    * ~1e-4, safely past the spec's 0.999 floor; each extra step is
    * one more 64-row×4096-row join in the oracle, trivial both
    * sides. */
  private val PowerIters = 64

  /** PCA dominant eigenvector by exact-integer power iteration
    * (q137): closes the LAST oracle seam in the PCA family. q106 pins
    * the distributed moments and q109 the projection, but the d×d
    * eigensolve itself was spec-pinned only (float Jacobi is not
    * portably expressible). [[Embeddings.powerIterationFixed]]
    * re-derives the dominant eigenvector in pure integer arithmetic —
    * exact scaled covariance `A = n·P − s·sᵀ` from the q106 moment
    * buffer, then 64 steps of `w = A·v; v ← (w·2²⁰) / max|w|`
    * — and the oracle REPLAYS THE ENTIRE SOLVE inside DuckDB: raw
    * floats → quantized moments → HUGEINT covariance → 64 unrolled
    * MATERIALIZED iteration CTEs with the same truncating division
    * (`//` in DuckDB 1.0 truncates toward zero like BigInt `/`).
    * Emits (slot, val): slots 0..d−1 the eigenvector (×2²⁰), slot d
    * the floor'd Rayleigh eigenvalue (×2⁴⁰). The distributed part is
    * the one pass that touches all 100 TB (the q106 moments agg); the
    * iteration is d×d driver work replayed bit-for-bit by the second
    * engine. */
  def pcaPower(s: SparkSession, d: String): DataFrame = {
    // the SHARDED accumulation path — the form that holds past the
    // single-buffer 2²³-row headroom at 100 TB; bit-identical to one
    // aggregator here (integer sums commute), so the oracle pins the
    // scale path itself
    val m = Embeddings.shardedMoments(
      Tables.embeddings(s, d), "vec_id", "embedding", EmbDim, shards = 8)
    val (v, lam) = Embeddings.powerIterationFixed(m, EmbDim, PowerIters)
    val rows = v.zipWithIndex.map { case (x, i) => (i, x.toLong) } :+
      ((EmbDim, lam.toLong))
    s.createDataFrame(rows.toIndexedSeq).toDF("slot", "val")
      .select(col("slot").cast("int").as("slot"), col("val"))
      .orderBy(col("slot"))
  }

  /** Shared front of the q137/q141 oracles: raw floats → quantized
    * moments → HUGEINT covariance `cov` → `iters` unrolled truncating
    * power-iteration CTEs over matrix `mat`, iterates named
    * `$p0..$p$iters`, each step's matvec `${w}$t`. */
  private def powerLoopSql(mat: String, p: String, w: String,
      iters: Int): String = {
    val fp = Embeddings.Fp
    val sb = new StringBuilder
    for (t <- 1 to iters) sb ++=
      s""",
      | $w$t AS MATERIALIZED (
      |  SELECT c.i AS i, SUM(c.a * v.v) AS w
      |  FROM $mat c JOIN $p${t - 1} v ON c.j = v.i GROUP BY c.i
      |), $p$t AS MATERIALIZED (
      |  SELECT i, CASE WHEN m.m = 0 THEN CAST(0 AS HUGEINT)
      |    ELSE (w * $fp) // m.m END AS v
      |  FROM $w$t, (SELECT MAX(ABS(w)) AS m FROM $w$t) m
      |)""".stripMargin
    sb.toString
  }

  /** f/nn/sums/pu/cov/it0 + the first 64-step solve + its final
    * matvec `wf` — everything q137 emits before its tail, reused
    * verbatim as q141's first stage. */
  private def powerPrefixSql: String = {
    val fp = Embeddings.Fp
    s"""WITH f AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $fp + 0.5) AS BIGINT) AS f
      |  FROM embeddings
      |), nn AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings
      |), sums AS MATERIALIZED (
      |  SELECT i, CAST(SUM(f) AS HUGEINT) AS s FROM f GROUP BY i
      |), pu AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.f AS HUGEINT) * b.f) AS p
      |  FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY a.i, b.i
      |), cov AS MATERIALIZED (
      |  SELECT pf.i, pf.j, (SELECT n FROM nn) * pf.p - sa.s * sb2.s AS a
      |  FROM (SELECT i, j, p FROM pu
      |        UNION ALL SELECT j AS i, i AS j, p FROM pu WHERE i < j) pf
      |  JOIN sums sa ON sa.i = pf.i JOIN sums sb2 ON sb2.i = pf.j
      |), it0 AS (SELECT i, CAST($fp AS HUGEINT) AS v FROM sums)""".stripMargin +
    powerLoopSql("cov", "it", "w", PowerIters) +
    s""",
      | wf AS MATERIALIZED (
      |  SELECT c.i AS i, SUM(c.a * v.v) AS w
      |  FROM cov c JOIN it$PowerIters v ON c.j = v.i GROUP BY c.i
      |)""".stripMargin
  }

  def pcaPowerOracle: String =
    powerPrefixSql + s""",
      | ray AS (
      |  SELECT CASE WHEN SUM(v.v * v.v) = 0 THEN CAST(0 AS HUGEINT)
      |    ELSE SUM(v.v * wf.w)
      |      // (SUM(v.v * v.v) * (SELECT n * n FROM nn)) END AS lam
      |  FROM it$PowerIters v JOIN wf ON wf.i = v.i
      |)
      |SELECT CAST(i AS INTEGER) AS slot, CAST(v AS BIGINT) AS val FROM it$PowerIters
      |UNION ALL SELECT $EmbDim, CAST(lam AS BIGINT) FROM ray
      |ORDER BY slot""".stripMargin

  /** SECOND principal component by exact-integer Hotelling deflation
    * (q141): retires the q137 caveat that only the DOMINANT
    * eigenvector was oracle-pinned. Same distributed part (the one
    * sharded-moments pass over the corpus — nothing new touches the
    * 100 TB); the driver then deflates `A′ = A·(v₁ᵀv₁) −
    * ⌊v₁ᵀAv₁/v₁ᵀv₁⌋·v₁v₁ᵀ`, renormalizes the matrix with one
    * truncating division, and re-runs the identical 64-step
    * iteration ([[Embeddings.deflatedPowerIterationFixed]]). The
    * oracle replays BOTH solves and the deflation arithmetic in
    * HUGEINT — 128 unrolled iteration CTEs — so component #2 is now
    * held to the same bit-for-bit second-engine standard as #1; the
    * float Jacobi basis column #2 is tied to this witness by
    * `PowerIterSpec`. Emits (slot, val): slots 0..d−1 the deflated
    * eigenvector (×2²⁰), slot d its Rayleigh eigenvalue against the
    * ORIGINAL covariance (×2⁴⁰). */
  def pcaDeflate(s: SparkSession, d: String): DataFrame = {
    val m = Embeddings.shardedMoments(
      Tables.embeddings(s, d), "vec_id", "embedding", EmbDim, shards = 8)
    val (v, lam) = Embeddings.deflatedPowerIterationFixed(m, EmbDim, PowerIters)
    val rows = v.zipWithIndex.map { case (x, i) => (i, x.toLong) } :+
      ((EmbDim, lam.toLong))
    s.createDataFrame(rows.toIndexedSeq).toDF("slot", "val")
      .select(col("slot").cast("int").as("slot"), col("val"))
      .orderBy(col("slot"))
  }

  def pcaDeflateOracle: String = {
    val fp = Embeddings.Fp
    powerPrefixSql + s""",
      | den AS (SELECT SUM(v.v * v.v) AS d2 FROM it$PowerIters v),
      | lama AS (
      |  SELECT CASE WHEN (SELECT d2 FROM den) = 0 THEN CAST(0 AS HUGEINT)
      |    ELSE (SELECT SUM(v.v * wf.w) FROM it$PowerIters v
      |          JOIN wf ON wf.i = v.i)
      |      // (SELECT d2 FROM den) END AS l),
      | defl AS MATERIALIZED (
      |  SELECT c.i AS i, c.j AS j,
      |    c.a * (SELECT d2 FROM den) - (SELECT l FROM lama) * va.v * vb.v AS a
      |  FROM cov c JOIN it$PowerIters va ON va.i = c.i
      |  JOIN it$PowerIters vb ON vb.i = c.j),
      | sc AS (SELECT GREATEST(CAST(1 AS HUGEINT),
      |    (SELECT MAX(ABS(a)) FROM defl) // $fp) AS s),
      | cov2 AS MATERIALIZED (
      |  SELECT i, j, a // (SELECT s FROM sc) AS a FROM defl),
      | jt0 AS (SELECT i, CAST($fp AS HUGEINT) AS v FROM sums)""".stripMargin +
    powerLoopSql("cov2", "jt", "x", PowerIters) + s""",
      | wf2 AS MATERIALIZED (
      |  SELECT c.i AS i, SUM(c.a * v.v) AS w
      |  FROM cov c JOIN jt$PowerIters v ON c.j = v.i GROUP BY c.i
      |), ray2 AS (
      |  SELECT CASE WHEN SUM(v.v * v.v) = 0 THEN CAST(0 AS HUGEINT)
      |    ELSE SUM(v.v * wf2.w)
      |      // (SUM(v.v * v.v) * (SELECT n * n FROM nn)) END AS lam
      |  FROM jt$PowerIters v JOIN wf2 ON wf2.i = v.i
      |)
      |SELECT CAST(i AS INTEGER) AS slot, CAST(v AS BIGINT) AS val FROM jt$PowerIters
      |UNION ALL SELECT $EmbDim, CAST(lam AS BIGINT) FROM ray2
      |ORDER BY slot""".stripMargin
  }

  /** q207 component count: the full projection basis width (q109
    * projects onto 8 components — this pins ALL of them). */
  private val BasisK = 8

  /** FULL 8-component integer eigenbasis (q207): retires the LAST
    * float seam in the PCA chain. q137 pinned component #1, q141
    * component #2; this loops [[Embeddings.deflatedBasisFixed]] to
    * k = 8 — the exact width q109's projection basis uses — and the
    * oracle replays ALL EIGHT solve+deflate rounds in HUGEINT (8×64
    * unrolled truncating power-iteration steps plus the seven
    * deflation/renormalization rounds between them). With this green,
    * every component of the q109 basis has a bit-for-bit second-
    * engine integer witness (`PowerIterSpec` ties the float Jacobi
    * columns to these witnesses by cosine), and the driver-side float
    * eigensolve is no longer load-bearing for correctness anywhere.
    *
    * Shape at scale: UNCHANGED from q137/q141 — the only distributed
    * work is the one sharded-moments pass over the corpus (one
    * map-side-combined shuffle, payload ≤ shards·(2+d+d(d+1)/2)
    * longs); all eight solves run on the driver's d×d BigInt matrix.
    * The between-rounds max-entry renormalization caps every deflated
    * matrix at ~2²¹, so chain depth never grows operand width — the
    * k=2 headroom argument covers k=8 (scaladoc on
    * [[Embeddings.deflatedBasisFixed]]).
    *
    * Emits (comp, slot, val): comp 0..7 the component, slots 0..d−1
    * its iterate (×2²⁰), slot d its Rayleigh eigenvalue against the
    * ORIGINAL covariance (×2⁴⁰) — so the comp-major sequence is the
    * λ₁ ≥ … ≥ λ₈ spectrum head. */
  def pcaBasis(s: SparkSession, d: String): DataFrame = {
    val m = Embeddings.shardedMoments(
      Tables.embeddings(s, d), "vec_id", "embedding", EmbDim, shards = 8)
    val basis = Embeddings.deflatedBasisFixed(m, EmbDim, PowerIters, BasisK)
    val rows = basis.zipWithIndex.flatMap { case ((v, lam), c) =>
      // the oracle's CAST(... AS BIGINT) errors loudly in DuckDB on
      // overflow; BigInt.toLong wraps silently — match the loud side
      // (iterates are ≤ 2²⁰ by normalization; λ×2⁴⁰ has wide but not
      // infinite headroom)
      require(lam.isValidLong,
        s"pcaBasis headroom: eigenvalue x2^40 $lam exceeds Long")
      v.foreach(x => require(x.isValidLong,
        s"pcaBasis headroom: iterate slot $x exceeds Long"))
      v.zipWithIndex.map { case (x, i) => (c, i, x.toLong) } :+
        ((c, EmbDim, lam.toLong))
    }
    s.createDataFrame(rows.toIndexedSeq).toDF("comp", "slot", "val")
      .select(col("comp").cast("int").as("comp"),
        col("slot").cast("int").as("slot"), col("val"))
      .orderBy(col("comp"), col("slot"))
  }

  /** One unrolled truncating power-iteration step PER CTE (vs
    * [[powerLoopSql]]'s two): the max-|w| normalizer comes from a
    * window `MAX(ABS(w)) OVER ()` instead of a second scalar CTE.
    * Same arithmetic, half the CTE-chain depth — q207's 8×64 steps
    * would blow DuckDB's 1000-deep binder recursion with the
    * two-CTE template (8 rounds ≈ 1100 chained CTEs); this form
    * stays ≈ 580 deep. */
  private def powerLoopSqlCompact(mat: String, p: String,
      iters: Int): String = {
    val fp = Embeddings.Fp
    val sb = new StringBuilder
    for (t <- 1 to iters) sb ++=
      s""",
      | $p$t AS MATERIALIZED (
      |  SELECT i, CASE WHEN m = 0 THEN CAST(0 AS HUGEINT)
      |    ELSE (w * $fp) // m END AS v
      |  FROM (SELECT i, w, MAX(ABS(w)) OVER () AS m
      |        FROM (SELECT c.i AS i, SUM(c.a * v.v) AS w
      |              FROM $mat c JOIN $p${t - 1} v ON c.j = v.i
      |              GROUP BY c.i))
      |)""".stripMargin
    sb.toString
  }

  /** The q141 oracle generalized to `k` rounds: the shared
    * f/nn/sums/pu/cov front, then per round r: the 64-step unrolled
    * solve on the CURRENT matrix, the original-covariance matvec +
    * Rayleigh (reported eigenvalue), and — between rounds — the
    * exact-integer Hotelling deflation `A′ = A·(vᵀv) − ⌊vᵀAv/vᵀv⌋·vvᵀ`
    * with the one truncating max-entry renormalization, exactly the
    * [[Embeddings.deflatedBasisFixed]] arithmetic. Generated, not
    * hand-written — the per-round block is one template. */
  def pcaBasisOracle: String = {
    val fp = Embeddings.Fp
    val sb = new StringBuilder
    sb ++= s"""WITH f AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $fp + 0.5) AS BIGINT) AS f
      |  FROM embeddings
      |), nn AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings
      |), sums AS MATERIALIZED (
      |  SELECT i, CAST(SUM(f) AS HUGEINT) AS s FROM f GROUP BY i
      |), pu AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.f AS HUGEINT) * b.f) AS p
      |  FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY a.i, b.i
      |), cov1 AS MATERIALIZED (
      |  SELECT pf.i, pf.j, (SELECT n FROM nn) * pf.p - sa.s * sb2.s AS a
      |  FROM (SELECT i, j, p FROM pu
      |        UNION ALL SELECT j AS i, i AS j, p FROM pu WHERE i < j) pf
      |  JOIN sums sa ON sa.i = pf.i JOIN sums sb2 ON sb2.i = pf.j
      |)""".stripMargin
    for (r <- 1 to BasisK) {
      val mat = s"cov$r"
      val it = s"b${r}i"   // iterates b{r}i0..b{r}i64
      sb ++= s""",
        | ${it}0 AS (SELECT i, CAST($fp AS HUGEINT) AS v FROM sums)"""
        .stripMargin
      sb ++= powerLoopSqlCompact(mat, it, PowerIters)
      val vf = s"$it$PowerIters"
      // Rayleigh against the ORIGINAL covariance cov1
      sb ++= s""",
        | b${r}wf AS MATERIALIZED (
        |  SELECT c.i AS i, SUM(c.a * v.v) AS w
        |  FROM cov1 c JOIN $vf v ON c.j = v.i GROUP BY c.i
        |), b${r}ray AS (
        |  SELECT CASE WHEN SUM(v.v * v.v) = 0 THEN CAST(0 AS HUGEINT)
        |    ELSE SUM(v.v * wf.w)
        |      // (SUM(v.v * v.v) * (SELECT n * n FROM nn)) END AS lam
        |  FROM $vf v JOIN b${r}wf wf ON wf.i = v.i
        |)""".stripMargin
      if (r < BasisK) {
        // deflation: lam-hat against the CURRENT matrix, then
        // A' = A*den - lamhat*v*vT, renormalized to max-entry ~2^21
        sb ++= s""",
          | b${r}wc AS MATERIALIZED (
          |  SELECT c.i AS i, SUM(c.a * v.v) AS w
          |  FROM $mat c JOIN $vf v ON c.j = v.i GROUP BY c.i
          |), b${r}den AS (SELECT SUM(v.v * v.v) AS d2 FROM $vf v),
          | b${r}lam AS (
          |  SELECT CASE WHEN (SELECT d2 FROM b${r}den) = 0
          |    THEN CAST(0 AS HUGEINT)
          |    ELSE (SELECT SUM(v.v * wc.w) FROM $vf v
          |          JOIN b${r}wc wc ON wc.i = v.i)
          |      // (SELECT d2 FROM b${r}den) END AS l),
          | b${r}defl AS MATERIALIZED (
          |  SELECT c.i AS i, c.j AS j,
          |    c.a * (SELECT d2 FROM b${r}den)
          |      - (SELECT l FROM b${r}lam) * va.v * vb.v AS a
          |  FROM $mat c JOIN $vf va ON va.i = c.i
          |  JOIN $vf vb ON vb.i = c.j),
          | b${r}sc AS (SELECT GREATEST(CAST(1 AS HUGEINT),
          |    (SELECT MAX(ABS(a)) FROM b${r}defl) // $fp) AS s),
          | cov${r + 1} AS MATERIALIZED (
          |  SELECT i, j, a // (SELECT s FROM b${r}sc) AS a FROM b${r}defl)"""
          .stripMargin
      }
    }
    val parts = (1 to BasisK).map { r =>
      s"""SELECT ${r - 1} AS comp, CAST(i AS INTEGER) AS slot,
         |  CAST(v AS BIGINT) AS val FROM b${r}i$PowerIters
         |UNION ALL SELECT ${r - 1}, $EmbDim, CAST(lam AS BIGINT)
         |  FROM b${r}ray""".stripMargin
    }
    sb ++= "\nSELECT comp, slot, val FROM (\n" +
      parts.mkString("\nUNION ALL\n") + "\n) ORDER BY comp, slot"
    sb.toString
  }

  /** Per-source rank normalization (q100): each document's n_chars
    * rank within its source + the source size — the cross-source
    * score calibration table (percentiles derive as (rank-1)/(n-1)
    * downstream; null-score rows are excluded, mirroring the token-
    * budget null-mass rule). */
  def rankNormalized(s: SparkSession, d: String): DataFrame =
    QualityScore.rankNormalize(
        Tables.documents(s, d).filter(col("n_chars").isNotNull),
        "source", "doc_id", "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("src_rank"), col("n_src"))
      .orderBy(col("doc_id"))

  def rankNormalizedOracle: String =
    s"""SELECT doc_id, source, n_chars,
       |  CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS src_rank,
       |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
       |FROM documents WHERE n_chars IS NOT NULL
       |ORDER BY doc_id""".stripMargin

  /** n-gram novelty vs the corpus (q97): per-doc distinct-bigram and
    * corpus-unique-bigram counts — the integer LM-proxy signal. */
  def ngramNovelty(s: SparkSession, d: String): DataFrame =
    QualityScore.ngramNovelty(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  def ngramNoveltyOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), g AS (
       |  SELECT DISTINCT doc_id, concat(toks[i], ' ', toks[i + 1]) AS gram
       |  FROM tok, UNNEST(range(1, len(toks))) t(i)
       |  WHERE len(toks) >= 2
       |), f AS (
       |  SELECT gram, count(*) AS df FROM g GROUP BY gram
       |), j AS (
       |  SELECT g.doc_id,
       |    CAST(count(*) AS BIGINT) AS nd,
       |    CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM g JOIN f USING (gram) GROUP BY g.doc_id
       |)
       |SELECT d.doc_id,
       |  COALESCE(j.nd, 0) AS n_distinct_grams,
       |  COALESCE(j.nn, 0) AS n_novel_grams
       |FROM documents d LEFT JOIN j USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Corpus bigram LM fluency score (q107): the CCNet-style
    * perplexity-filter signal in exact fixed point
    * ([[QualityScore.lmScore]]). The oracle recomputes the LM and the
    * per-doc aggregation INDEPENDENTLY from the raw text (counts →
    * integer-division probabilities → occurrence-weighted sums), not
    * by replaying the engine's procedure. */
  def lmScore(s: SparkSession, d: String): DataFrame =
    QualityScore.lmScore(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  private val LmFp = 1L << 20

  def lmScoreOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), occ AS (
       |  SELECT doc_id, concat(toks[i], ' ', toks[i + 1]) AS gram
       |  FROM tok, UNNEST(range(1, len(toks))) t(i)
       |  WHERE len(toks) >= 2
       |), dg AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c_dg
       |  FROM occ GROUP BY 1, 2
       |), gc AS (
       |  SELECT gram, CAST(SUM(c_dg) AS BIGINT) AS cb FROM dg GROUP BY gram
       |), pc AS (
       |  SELECT split_part(gram, ' ', 1) AS w1, CAST(SUM(cb) AS BIGINT) AS cu
       |  FROM gc GROUP BY 1
       |), gp AS (
       |  SELECT gc.gram, CAST((gc.cb * $LmFp) // pc.cu AS BIGINT) AS p_fp
       |  FROM gc JOIN pc ON split_part(gc.gram, ' ', 1) = pc.w1
       |), j AS (
       |  SELECT dg.doc_id,
       |    CAST(SUM(dg.c_dg) AS BIGINT) AS n,
       |    CAST(SUM(dg.c_dg * gp.p_fp) AS BIGINT) AS sp,
       |    CAST(MIN(gp.p_fp) AS BIGINT) AS mp
       |  FROM dg JOIN gp USING (gram) GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  COALESCE(j.n, 0) AS n_bigrams,
       |  COALESCE(j.sp, 0) AS sum_p_fp,
       |  COALESCE(j.mp, 0) AS min_p_fp
       |FROM documents d LEFT JOIN j USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Sliding-window document chunking (q108): long documents cut into
    * fixed-size training windows ([[Packing.chunkDocuments]], 64-token
    * windows advancing by 48). The oracle recomputes the window
    * arithmetic and the slice/rejoin independently in DuckDB list
    * algebra. */
  def docChunks(s: SparkSession, d: String): DataFrame =
    Packing.chunkDocuments(Tables.documents(s, d),
        chunkTokens = ChunkLen, stride = ChunkStride)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val ChunkLen = 64
  private val ChunkStride = 48

  def docChunksOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), nch AS (
       |  SELECT doc_id, toks,
       |    1 + greatest(0, (len(toks) - $ChunkLen + $ChunkStride - 1) // $ChunkStride) AS nchunks
       |  FROM tok WHERE len(toks) >= 1
       |)
       |SELECT doc_id,
       |  CAST(k AS BIGINT) AS chunk_idx,
       |  CAST(k * $ChunkStride AS BIGINT) AS start_tok,
       |  CAST(least($ChunkLen, len(toks) - k * $ChunkStride) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(toks[k * $ChunkStride + 1 : k * $ChunkStride + $ChunkLen], ' ') AS chunk_text
       |FROM nch, UNNEST(range(0, nchunks)) t(k)
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** PCA projection (q109): closes the oracle loop around PCA — q106
    * gates the distributed moment accumulation; this gates the
    * PROJECTION arithmetic by feeding the driver-computed eigenbasis
    * into DuckDB as literals. The term strings are rendered once by
    * [[Embeddings.projectionTermSql]] and shared verbatim between the
    * Spark expression and the oracle SQL, so both engines parse the
    * same shortest-roundtrip double literals and add in the same
    * left-associative order — IEEE arithmetic makes the projected
    * floats bit-identical. Only the d×d driver eigensolve itself
    * remains spec-pinned (a Jacobi sweep is not portably expressible
    * in SQL). */
  def pcaProjection(s: SparkSession, d: String): DataFrame = {
    val (mean, basis) = pcaFit(s, d)
    Embeddings.project(Tables.embeddings(s, d), "embedding", "pca",
        mean, basis)
      .select(col("vec_id"), posexplode(col("pca")).as(Seq("k", "v")))
      .select(col("vec_id"), col("k").cast("long").as("k"),
        col("v").cast("double").as("val"))
      .orderBy(col("vec_id"), col("k"))
  }

  private val PcaK = 8

  /** Deterministic per-dir PCA fit memo (mean + top-k eigenbasis).
    * The q109 ORACLE needs the fitted basis as SQL literals, but the
    * oracle map carries no (session, dir) — Verify runs every query
    * BEFORE dumping oracle_sql.json, so the query-side fit parks the
    * basis here and the oracle def reads it back. The fit itself is
    * deterministic (exact integer moments + deterministic Jacobi), so
    * the memo is also the q90-style train-once artifact share. */
  private val pcaFitMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Array[Double], Array[Array[Double]])]
  @volatile private var pcaLastFit
      : Option[(Array[Double], Array[Array[Double]])] = None

  private def pcaFit(s: SparkSession, d: String)
      : (Array[Double], Array[Array[Double]]) = {
    val fit = pcaFitMemo.getOrElseUpdate(
      new java.io.File(d).getCanonicalPath, {
        val (m, cov) =
          Embeddings.meanCovariance(Tables.embeddings(s, d), "embedding", EmbDim)
        (m, Embeddings.topEigenvectors(cov, PcaK))
      })
    pcaLastFit = Some(fit)
    fit
  }

  def pcaProjectionOracle: String = pcaLastFit match {
    case None =>
      // q109 never ran in this JVM (fit failed or filtered out): keep
      // oracle_sql.json dumpable — this fallback fails ONLY q109's
      // compare instead of poisoning the whole dump.
      "SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS k, " +
        "CAST(NULL AS DOUBLE) AS val WHERE false"
    case Some((mean, basis)) =>
      val comps = basis.map { row =>
        val terms = Embeddings.projectionTermSql(mean, row,
          i => s"embedding[${i + 1}]")
        s"CAST(CAST(($terms) AS REAL) AS DOUBLE)"
      }.mkString("[", ", ", "]")
      s"""SELECT vec_id,
         |  CAST(generate_subscripts(p, 1) - 1 AS BIGINT) AS k,
         |  unnest(p) AS val
         |FROM (SELECT vec_id, $comps AS p FROM embeddings)
         |ORDER BY vec_id, k""".stripMargin
  }

  /** BPE-budget document chunking (q111): cut each document into
    * training windows of ≤ ~[[BpeChunkBudget]] LEARNED subword tokens
    * ([[Packing.chunkByTokenBudget]] over [[Bpe.wordSymCounts]]) —
    * the q108 fixed-count chunker's budget-aware sibling: window
    * boundaries land where the cumulative BPE token offset crosses
    * the budget, so every chunk costs the model the same, regardless
    * of how subword-dense the words are. Shares the q90/q94/q104
    * trained merge table ([[trainedMerges]]). The oracle replays BPE
    * training (the shared CTE chain), the positional symbol counts,
    * and the per-doc cumsum-offset rule — training and chunking gated
    * as one system, same pattern as q94. */
  def bpeChunks(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val wsc = Bpe.wordSymCounts(docs, "doc_id", "text", trainedMerges(s, d))
    Packing.chunkByTokenBudget(wsc, budget = BpeChunkBudget)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val BpeChunkBudget = 32L

  def bpeChunksOracle: String =
    s"""WITH $bpeCtes, wc AS (
       |  SELECT w.doc_id, w.i, enc.n_syms FROM w JOIN enc USING (word)
       |), cum AS (
       |  SELECT doc_id, i, n_syms,
       |    COALESCE(SUM(n_syms) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM wc
       |)
       |SELECT doc_id,
       |  CAST(cb // $BpeChunkBudget AS BIGINT) AS chunk_idx,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       |  CAST(MIN(i) - 1 AS BIGINT) AS start_word
       |FROM cum GROUP BY doc_id, cb // $BpeChunkBudget
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** INT8 embedding quantization (q110): [[Embeddings.int8Quantize]]
    * on the oracle surface — per-vector symmetric max-|component|
    * scale, integer-exact codes (the +amax shift keeps the numerator
    * non-negative so Spark `DIV` ≡ DuckDB `//`), and the ×127-scale
    * reconstruction-error sums; codes_md5 gates the full code stream
    * without shipping d INTs per row through the compare. */
  def int8Quantized(s: SparkSession, d: String): DataFrame =
    Embeddings.int8Quantize(Tables.embeddings(s, d))
      .orderBy(col("vec_id"))

  def int8QuantizedOracle: String =
    s"""WITH f AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * ${Embeddings.Fp} + 0.5) AS BIGINT) AS fq
       |  FROM embeddings
       |), am AS (
       |  SELECT vec_id, MAX(ABS(fq)) AS amax_fp FROM f GROUP BY vec_id
       |), c AS (
       |  SELECT f.vec_id, f.i, f.fq, am.amax_fp,
       |    CAST(CASE WHEN am.amax_fp = 0 THEN 0
       |      ELSE ((f.fq + am.amax_fp) * 254) // (2 * am.amax_fp) - 127 END AS INTEGER) AS code
       |  FROM f JOIN am USING (vec_id)
       |)
       |SELECT vec_id, CAST(amax_fp AS BIGINT) AS amax_fp,
       |  CAST(SUM(ABS(fq * 127 - CAST(code AS BIGINT) * amax_fp)) AS BIGINT) AS sum_abs_err127,
       |  CAST(MAX(ABS(fq * 127 - CAST(code AS BIGINT) * amax_fp)) AS BIGINT) AS max_abs_err127,
       |  md5(string_agg(CAST(code AS VARCHAR), ' ' ORDER BY i)) AS codes_md5
       |FROM c GROUP BY vec_id, amax_fp ORDER BY vec_id""".stripMargin

  /** Gopher rule battery (q112): [[QualityScore.gopherRules]] on the
    * oracle surface — the published keep/drop rules (Rae et al. 2021)
    * as cross-multiplied integer tests, every flag and raw count
    * recomputed by DuckDB. One narrow projection, no shuffle. */
  def gopherRules(s: SparkSession, d: String): DataFrame =
    QualityScore.gopherRules(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  def gopherRulesOracle: String = {
    val req = QualityScore.GopherRequiredStopwords
      .map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH tok AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(text, '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS sum_word_chars,
       |    CAST((length(text) - length(replace(text, '#', '')))
       |      + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols,
       |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
       |    CAST(len(list_intersect(list_transform(toks, t -> lower(t)), $req)) AS BIGINT) AS n_req_stopwords
       |  FROM tok
       |), f AS (
       |  SELECT *,
       |    (CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
       |    + (CASE WHEN n_words > 0 AND 3 * n_words <= sum_word_chars
       |            AND sum_word_chars <= 10 * n_words THEN 2 ELSE 0 END)
       |    + (CASE WHEN 10 * n_symbols <= n_words THEN 4 ELSE 0 END)
       |    + (CASE WHEN 5 * n_alpha_words >= 4 * n_words THEN 8 ELSE 0 END)
       |    + (CASE WHEN n_req_stopwords >= 2 THEN 16 ELSE 0 END) AS rules_passed
       |  FROM m
       |)
       |SELECT doc_id, n_words, sum_word_chars, n_symbols, n_alpha_words,
       |  n_req_stopwords, CAST(rules_passed AS BIGINT) AS rules_passed,
       |  CAST(CASE WHEN rules_passed = 31 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Quality-aware dedup survivors (q113): keep-BEST near-dup
    * resolution — production pipelines keep the highest-quality
    * member of each duplicate cluster, not the smallest id (the
    * keep-first rule q13/q54 use). Near-dup components (the q55
    * transitive closure over the md5-portable minhash pairs) are
    * scored with an integer quality metric (whitespace token count),
    * and each component's survivor is its argmax by
    * (q_score desc, doc_id asc) — a total, reproducible order.
    *
    * Scale shape: components via the O(log n) star rounds, scores via
    * one narrow projection, survivor = one `max_by` partial agg keyed
    * by component (never a per-component window sort), one keyed join
    * back. The oracle replays components, scores, and the argmax
    * independently. */
  def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = DedupOps.minhashNearDupPairs(docs, minJaccard = 0.5,
        md5Based = true)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    val comp = ConnectedComponents.componentsWithSingletons(docs, "doc_id", pairs)
    val scored = QualityScore.metrics(docs)
      .select(col("doc_id"), col("n_tokens").as("q_score"))
    val joined = comp.join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("component"),
        coalesce(col("q_score"), lit(0L)).as("q_score"))
    val best = joined.groupBy(col("component"))
      .agg(max_by(col("doc_id"), struct(col("q_score"), -col("doc_id")))
        .as("__best_id"))
    joined.join(best, Seq("component"))
      .select(col("doc_id"), col("component"), col("q_score"),
        when(col("doc_id") === col("__best_id"), 1L).otherwise(0L)
          .as("is_survivor"))
      .orderBy(col("doc_id"))
  }

  def dedupKeepBestOracle: String =
    s"""WITH RECURSIVE ${minhashPairsCtes("documents")}, edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |  UNION ALL
       |  SELECT id_b AS a, id_a AS b FROM pairs WHERE n_inter >= 0.5 * (sum_len - n_inter)
       |), reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
       |), comp AS (
       |  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
       |), scored AS (
       |  SELECT c.doc_id, c.component,
       |    CAST(CASE WHEN length(trim(d.text)) > 0
       |      THEN len(string_split_regex(trim(d.text), '${Tok.WS}'))
       |      ELSE 0 END AS BIGINT) AS q_score
       |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
       |), best AS (
       |  SELECT component, doc_id AS best_id FROM (
       |    SELECT component, doc_id, row_number() OVER (
       |      PARTITION BY component ORDER BY q_score DESC, doc_id ASC) AS rn
       |    FROM scored)
       |  WHERE rn = 1
       |)
       |SELECT s.doc_id, s.component, s.q_score,
       |  CAST(CASE WHEN s.doc_id = b.best_id THEN 1 ELSE 0 END AS BIGINT) AS is_survivor
       |FROM scored s JOIN best b ON b.component = s.component
       |ORDER BY s.doc_id""".stripMargin

  /** Tokenizer FERTILITY card (q114): per (source, lang) — document
    * count, char mass, whitespace-word mass, and learned-BPE token
    * mass under the shared q90 tokenizer. Fertility (BPE tokens per
    * word) and compression (chars per BPE token) are THE diagnostics
    * for how a tokenizer treats each slice of a mixed corpus — a
    * source whose fertility is 2× the rest pays 2× the context budget
    * per word, which skews the effective data mix. Integer sums only;
    * consumers derive the ratios. The oracle replays BPE training +
    * encode counts + the rollup as one chain.
    *
    * Scale shape: encode is the broadcast-merge-table per-word replay
    * (q90's shape); the rollup is one partial-agg groupBy over
    * (source, lang) — ~|sources|·|langs| result rows. */
  def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = trainedMerges(s, d)
    val counts = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
    docs.select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("__nc"))
      .join(counts, Seq("doc_id"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nc")).as("sum_chars"),
        sum(col("n_words")).as("sum_words"),
        sum(col("n_bpe_tokens")).as("sum_bpe_tokens"))
      .orderBy(col("source"), col("lang"))
  }

  def tokenizerFertilityOracle: String =
    s"""WITH $bpeCtes, cnt AS (
       |  SELECT t.doc_id,
       |    CAST(COUNT(w.word) AS BIGINT) AS n_words,
       |    CAST(COALESCE(SUM(enc.n_syms), 0) AS BIGINT) AS n_bpe
       |  FROM tok t
       |  LEFT JOIN w ON w.doc_id = t.doc_id
       |  LEFT JOIN enc ON enc.word = w.word
       |  GROUP BY t.doc_id
       |)
       |SELECT d.source, d.lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(length(d.text)) AS BIGINT) AS sum_chars,
       |  CAST(SUM(c.n_words) AS BIGINT) AS sum_words,
       |  CAST(SUM(c.n_bpe) AS BIGINT) AS sum_bpe_tokens
       |FROM documents d JOIN cnt c ON c.doc_id = d.doc_id
       |GROUP BY d.source, d.lang
       |ORDER BY d.source, d.lang""".stripMargin

  /** The q115 probe terms: high-, mid-, and low-frequency corpus
    * words plus one absent term (exact count 0 — the CMS one-sided
    * error is visible as est ≥ 0 = exact there). */
  private val CmsProbeTerms: Seq[String] =
    Seq("table", "spark", "the", "vector", "customer", "window",
      "zzz_absent")

  private val CmsDepth = 4
  private val CmsWidth = 256

  /** Count-Min sketch point queries (q115): build the
    * [[Sketches.cmsSketch]] over the corpus token stream, probe it
    * for a fixed term list, and emit the estimate NEXT TO the exact
    * count — the one-sided error (est ≥ exact, always) is on the
    * oracle surface, not just asserted in a spec. DuckDB recomputes
    * the token stream, every md5 bucket row, the full d×w sketch,
    * and the min-over-rows estimates. */
  def cmsFrequency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tokens = graft.util.Par.ensure(docs).select(
      explode(expr(s"filter(split(lower(text), '${Tok.WsSqlLit}'), t -> t <> '')"))
        .as("term"))
    val sketch = Sketches.cmsSketch(tokens, "term", CmsDepth, CmsWidth)
    val probes = CmsProbeTerms.toDF("term")
    val est = Sketches.cmsEstimate(sketch, probes, "term", CmsDepth, CmsWidth)
    val exact = tokens.groupBy(col("term")).agg(count(lit(1)).as("__n"))
    est.join(exact, Seq("term"), "left_outer")
      .select(col("term"), col("est_count"),
        coalesce(col("__n"), lit(0L)).as("exact_count"))
      .orderBy(col("term"))
  }

  def cmsFrequencyOracle: String = {
    val probeList = CmsProbeTerms.map(t => s"'$t'").mkString("[", ",", "]")
    s"""WITH tok AS (
       |  SELECT list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), t AS (
       |  SELECT unnest(toks) AS term FROM tok
       |), buck AS (
       |  SELECT j, CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 15) AS BIGINT) % $CmsWidth AS bucket
       |  FROM t, UNNEST(range($CmsDepth)) r(j)
       |), sk AS (
       |  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM buck GROUP BY j, bucket
       |), pr AS (
       |  SELECT unnest($probeList) AS term
       |), pb AS (
       |  SELECT term, j, CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 15) AS BIGINT) % $CmsWidth AS bucket
       |  FROM pr, UNNEST(range($CmsDepth)) r(j)
       |), est AS (
       |  SELECT pb.term, MIN(COALESCE(sk.cnt, 0)) AS est_count
       |  FROM pb LEFT JOIN sk ON sk.j = pb.j AND sk.bucket = pb.bucket
       |  GROUP BY pb.term
       |), ex AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY term
       |)
       |SELECT e.term, e.est_count, CAST(COALESCE(ex.n, 0) AS BIGINT) AS exact_count
       |FROM est e LEFT JOIN ex ON ex.term = e.term
       |ORDER BY e.term""".stripMargin
  }

  /** Canonicalized exact dedup (q116): [[DedupOps.canonicalDedup]]
    * over the corpus PLUS planted case/punct/whitespace variants —
    * every doc with id ≡ 3 (mod 7) re-enters under id + 1,000,000
    * with its first five chars uppercased, every space doubled, and
    * " !!" appended (a deterministic, engine-portable perturbation,
    * the q92 synth precedent). Raw-hash dedup (q12) cannot merge the
    * variant with its original; the canonical hash must — visible on
    * the surface as `n_distinct_raw > 1` for exactly the planted
    * groups. The oracle recomputes the perturbation AND the
    * canonicalization chain. */
  def canonicalDedupQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val variants = docs.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("concat(replace(concat(upper(substring(text, 1, 5)), " +
          "substring(text, 6)), ' ', '  '), ' !!')").as("text"))
    DedupOps.canonicalDedup(docs.unionByName(variants))
      .orderBy(col("canon_md5"))
  }

  def canonicalDedupOracle: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    concat(replace(concat(upper(substring(text, 1, 5)),
      |      substring(text, 6)), ' ', '  '), ' !!')
      |  FROM documents WHERE doc_id % 7 = 3
      |), canon AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[[:punct:]]', '', 'g'), '\s+', ' ', 'g'))) AS canon_md5,
      |    md5(text) AS raw_md5
      |  FROM uni
      |)
      |SELECT canon_md5,
      |  CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  CAST(COUNT(DISTINCT raw_md5) AS BIGINT) AS n_distinct_raw
      |FROM canon GROUP BY canon_md5 ORDER BY canon_md5""".stripMargin

  /** OOV-gram rate vs the train split (q117):
    * [[QualityScore.gramOovScore]] with the reference = the q77
    * doc-hash train band — each document's bigram occurrences tested
    * for membership in the train slice's bigram vocabulary. Val/test
    * docs with high OOV mass measure real train→eval generalization
    * distance; train docs score their outlierness against their own
    * split. Split + integer counts on the surface; the oracle
    * recomputes the band assignment, the reference vocabulary, and
    * the occurrence-weighted membership sums. */
  def oovScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val split = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .select(col("doc_id"), col("split"))
    val ref = docs.join(split.filter(col("split") === "train")
      .select(col("doc_id")), Seq("doc_id"), "left_semi")
    QualityScore.gramOovScore(docs, ref)
      .join(split, Seq("doc_id"))
      .select(col("doc_id"), col("split"), col("n_grams"), col("n_oov_grams"))
      .orderBy(col("doc_id"))
  }

  def oovScoreOracle: String = {
    val key = "substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)"
    s"""WITH sp AS (
       |  SELECT doc_id,
       |    CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, concat(toks[i], ' ', toks[i + 1]) AS gram
       |  FROM tok, UNNEST(range(1, len(toks))) t(i)
       |  WHERE len(toks) >= 2
       |), dg AS (
       |  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM g GROUP BY doc_id, gram
       |), ref AS (
       |  SELECT DISTINCT g.gram FROM g JOIN sp ON sp.doc_id = g.doc_id
       |  WHERE sp.split = 'train'
       |), per AS (
       |  SELECT dg.doc_id, SUM(dg.c) AS n,
       |    SUM(CASE WHEN r.gram IS NULL THEN dg.c ELSE 0 END) AS oov
       |  FROM dg LEFT JOIN ref r ON r.gram = dg.gram
       |  GROUP BY dg.doc_id
       |)
       |SELECT d.doc_id, sp.split,
       |  CAST(COALESCE(per.n, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(per.oov, 0) AS BIGINT) AS n_oov_grams
       |FROM documents d
       |JOIN sp ON sp.doc_id = d.doc_id
       |LEFT JOIN per ON per.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private val ApportionBudget = 100000L

  /** Temperature-scaled budget apportionment (q118):
    * [[Packing.sqrtApportion]] of a 100k-token budget across the
    * corpus sources by √(token mass) — α = 1/2 sampling in exact
    * integers, Hamilton largest-remainder rounding, Σ quota = budget
    * exactly. The oracle replays masses, integer square roots,
    * floors, remainders, and the tie-ranked top-up. */
  def mixtureApportion(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val withTokens = docs.select(col("source"),
      size(expr(s"filter(split(lower(text), '${Tok.WsSqlLit}'), t -> t <> '')"))
        .cast("long").as("n_tokens"))
    Packing.sqrtApportion(withTokens, "source", "n_tokens", ApportionBudget)
      .orderBy(col("source"))
  }

  def mixtureApportionOracle: String =
    s"""WITH m AS (
       |  SELECT source,
       |    CAST(SUM(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> ''))) AS BIGINT) AS token_mass
       |  FROM documents GROUP BY source
       |), w AS (
       |  SELECT source, token_mass,
       |    CAST(floor(sqrt(CAST(token_mass AS DOUBLE))) AS BIGINT) AS t0
       |  FROM m
       |), wi AS (
       |  SELECT source, token_mass,
       |    CASE WHEN t0 * t0 > token_mass THEN t0 - 1
       |         WHEN (t0 + 1) * (t0 + 1) <= token_mass THEN t0 + 1
       |         ELSE t0 END AS weight
       |  FROM w
       |), tot AS (
       |  SELECT SUM(weight) AS tw FROM wi
       |), b AS (
       |  SELECT wi.source, wi.token_mass, wi.weight,
       |    ($ApportionBudget * wi.weight) // tot.tw AS base,
       |    ($ApportionBudget * wi.weight) % tot.tw AS rem
       |  FROM wi, tot
       |), lo AS (
       |  SELECT $ApportionBudget - SUM(base) AS leftover FROM b
       |), r AS (
       |  SELECT b.*, row_number() OVER (ORDER BY b.rem DESC, b.source ASC) AS rr
       |  FROM b
       |)
       |SELECT r.source, r.token_mass, r.weight,
       |  CAST(r.base + CASE WHEN r.rr <= lo.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM r, lo ORDER BY r.source""".stripMargin

  /** Character-fraction repetition rules (q119):
    * [[QualityScore.repetitionCharMetrics]] on the oracle surface —
    * the Gopher repetition battery in its PUBLISHED units (fractions
    * of characters, not grams): top-2-gram char mass and
    * overlap-merged duplicated-5-gram char coverage, with the keep
    * flag as cross-multiplied integer thresholds. The oracle rebuilds
    * positional grams from UNNEST WITH ORDINALITY, replays the
    * char-offset cumsum, the (count desc, gram asc) top pick, and the
    * running-max interval union. (Positional unnest via
    * `generate_subscripts` — DuckDB 1.0 has no WITH ORDINALITY.) */
  def repetitionChars(s: SparkSession, d: String): DataFrame =
    QualityScore.repetitionCharMetrics(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  def repetitionCharsOracle: String =
    s"""WITH tok0 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS t,
       |    generate_subscripts(toks, 1) - 1 AS i
       |  FROM tok0
       |), pos AS (
       |  SELECT doc_id, i, t,
       |    COALESCE(SUM(length(t) + 1) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
       |    CAST(length(t) AS BIGINT) AS len,
       |    CASE WHEN lead(t, 1) OVER w IS NOT NULL
       |      THEN concat_ws(' ', t, lead(t, 1) OVER w) END AS gtop,
       |    CASE WHEN lead(t, 4) OVER w IS NOT NULL
       |      THEN concat_ws(' ', t, lead(t, 1) OVER w, lead(t, 2) OVER w,
       |        lead(t, 3) OVER w, lead(t, 4) OVER w) END AS gdup
       |  FROM tok
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
       |), nc AS (
       |  SELECT doc_id, SUM(len) + COUNT(*) - 1 AS n_chars
       |  FROM pos GROUP BY doc_id
       |), tc AS (
       |  SELECT doc_id, gtop, COUNT(*) AS c
       |  FROM pos WHERE gtop IS NOT NULL GROUP BY doc_id, gtop
       |), top AS (
       |  SELECT doc_id, c AS top_count, c * length(gtop) AS top_chars
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY c DESC, gtop ASC) AS rn FROM tc)
       |  WHERE rn = 1
       |), dc AS (
       |  SELECT doc_id, gdup FROM pos WHERE gdup IS NOT NULL
       |  GROUP BY doc_id, gdup HAVING COUNT(*) > 1
       |), occ AS (
       |  SELECT p.doc_id, p.s, p.s + length(p.gdup) - 1 AS e
       |  FROM pos p JOIN dc ON p.doc_id = dc.doc_id AND p.gdup = dc.gdup
       |), cov AS (
       |  SELECT doc_id, s, e,
       |    GREATEST(s - 1, COALESCE(MAX(e) OVER (PARTITION BY doc_id
       |      ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1)) AS fl
       |  FROM occ
       |), dup AS (
       |  SELECT doc_id, SUM(GREATEST(e - fl, 0)) AS dup_chars
       |  FROM cov GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(nc.n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(COALESCE(top.top_count, 0) AS BIGINT) AS top2_count,
       |  CAST(COALESCE(top.top_chars, 0) AS BIGINT) AS top2_chars,
       |  CAST(COALESCE(dup.dup_chars, 0) AS BIGINT) AS dup5_chars,
       |  CAST(CASE WHEN COALESCE(top.top_chars, 0) * 5 <= COALESCE(nc.n_chars, 0)
       |         AND COALESCE(dup.dup_chars, 0) * 20 <= COALESCE(nc.n_chars, 0) * 3
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep_rep
       |FROM documents d
       |LEFT JOIN nc ON d.doc_id = nc.doc_id
       |LEFT JOIN top ON d.doc_id = top.doc_id
       |LEFT JOIN dup ON d.doc_id = dup.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q120's target slice and hash-bucket count (power of two — the
    * mask ≡ unsigned-modulo equivalence). */
  private val DsirTarget = "src0"
  private val DsirBuckets = 4096

  /** DSIR importance weights (q120): [[Importance.importanceWeights]]
    * of the whole corpus against the `src0` slice as the target
    * distribution — Xie et al. 2023's hashed-n-gram importance
    * resampling scores in EXACT Q16 fixed point. The oracle rebuilds
    * the unigram+bigram bucket stream (fnv mirror ≡ mask hash),
    * both smoothed distributions, and every log2 through the
    * [[FixedLogSql]] square-and-shift chain — bit-identical BIGINT
    * weights, something float log-likelihoods could never hash-match. */
  def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Importance.importanceWeights(docs,
        docs.filter(col("source") === DsirTarget),
        "doc_id", "text", DsirBuckets)
      .orderBy(col("doc_id"))
  }

  def dsirWeightsOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), gr AS (
       |  SELECT doc_id, source, unnest(list_concat(toks,
       |    CASE WHEN len(toks) >= 2
       |      THEN list_transform(range(1, len(toks)),
       |             bi -> concat_ws(' ', toks[bi], toks[bi + 1]))
       |      ELSE [] END)) AS g
       |  FROM tok
       |), occ AS (
       |  SELECT doc_id, source,
       |    CAST(${MinhashMirrorSql.fnvSql("g")} % $DsirBuckets AS BIGINT) AS b
       |  FROM gr
       |), pdb AS (
       |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1, 2
       |), rb AS (
       |  SELECT b, SUM(c) AS cr FROM pdb GROUP BY 1
       |), tb AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS ct
       |  FROM occ WHERE source = '$DsirTarget' GROUP BY 1
       |), nrt AS (
       |  SELECT (SELECT SUM(cr) FROM rb) AS nr,
       |         (SELECT COALESCE(SUM(ct), 0) FROM tb) AS nt
       |), lv AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT COALESCE(tb.ct, 0) + 1 AS v FROM rb LEFT JOIN tb USING (b)
       |    UNION SELECT cr + 1 FROM rb
       |    UNION SELECT nr + $DsirBuckets FROM nrt
       |    UNION SELECT nt + $DsirBuckets FROM nrt)
       |), ${FixedLogSql.logCtes()}, wb AS (
       |  SELECT rb.b, lt.lg - lr.lg AS w
       |  FROM rb LEFT JOIN tb USING (b)
       |  JOIN llog lt ON lt.v = COALESCE(tb.ct, 0) + 1
       |  JOIN llog lr ON lr.v = rb.cr + 1
       |), nrm AS (
       |  SELECT l1.lg - l2.lg AS nrm FROM nrt
       |  JOIN llog l1 ON l1.v = nrt.nr + $DsirBuckets
       |  JOIN llog l2 ON l2.v = nrt.nt + $DsirBuckets
       |), pd AS (
       |  SELECT pdb.doc_id, SUM(pdb.c) AS n, SUM(pdb.c * wb.w) AS s
       |  FROM pdb JOIN wb ON pdb.b = wb.b GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(pd.n, 0) AS BIGINT) AS n_feats,
       |  CAST(COALESCE(pd.s, 0) + COALESCE(pd.n, 0) * nrm.nrm AS BIGINT) AS weight_fp
       |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id CROSS JOIN nrm
       |ORDER BY d.doc_id""".stripMargin

  /** Codepoint-entropy quality gate (q121):
    * [[QualityScore.charEntropy]] — n·H in exact Q16 via the same
    * fixed-point log2 as q120, plus the floor(1000·H) threshold form.
    * The oracle explodes codepoints, recounts, and replays the log
    * chain over the DISTINCT count values only. */
  def charEntropyQ(s: SparkSession, d: String): DataFrame =
    QualityScore.charEntropy(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  def charEntropyOracle: String =
    s"""WITH ch AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, length(text) + 1), i -> text[i:i])) AS c
       |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
       |), cnt AS (
       |  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2
       |), tot AS (
       |  SELECT doc_id, SUM(n) AS nn FROM cnt GROUP BY 1
       |), lv AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT n AS v FROM cnt UNION SELECT nn FROM tot)
       |), ${FixedLogSql.logCtes()}, sl AS (
       |  SELECT cnt.doc_id, SUM(cnt.n * l.lg) AS slg
       |  FROM cnt JOIN llog l ON l.v = cnt.n GROUP BY 1
       |), ent AS (
       |  SELECT tot.doc_id, tot.nn, tot.nn * ln.lg - sl.slg AS e
       |  FROM tot JOIN llog ln ON ln.v = tot.nn
       |  JOIN sl ON sl.doc_id = tot.doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(ent.nn, 0) AS BIGINT) AS n_cp,
       |  CAST(COALESCE(ent.e, 0) AS BIGINT) AS ent_nfp,
       |  CAST(CASE WHEN COALESCE(ent.nn, 0) = 0 THEN 0
       |    ELSE (ent.e * 1000) // (ent.nn * 65536) END AS BIGINT)
       |    AS milli_bits_per_char
       |FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q122's shard count and epoch salt. */
  private val ShuffleShards = 8
  private val ShuffleSalt = "ep0"

  /** Deterministic epoch shuffle (q122): [[Sampling.epochShuffle]] —
    * the reproducible training-order permutation, sharded for N
    * parallel loaders, positions via banded prefix sums (never a
    * global sort, never one task per shard). The oracle recomputes
    * the permutation as a plain per-shard window rank over the same
    * md5 keys. */
  def epochShuffleQ(s: SparkSession, d: String): DataFrame =
    Sampling.epochShuffle(Tables.documents(s, d), "doc_id",
        ShuffleShards, ShuffleSalt)
      .orderBy(col("doc_id"))

  def epochShuffleOracle: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    substring(md5(CAST(doc_id AS VARCHAR) || '$ShuffleSalt'), 1, 8) AS key
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, key,
       |    CAST('0x' || key AS BIGINT) % $ShuffleShards AS shard
       |  FROM k
       |)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
       |    AS BIGINT) AS pos
       |FROM s ORDER BY doc_id""".stripMargin

  /** PII redaction (q123): [[Pii.redact]] over the corpus with
    * deterministic PII planted in-query (the q99 `doc_id % k` planting
    * convention — the synthetic corpus contains no organic PII, so
    * both engines append the same emails/IPs/phones/SSNs before
    * scrubbing). The oracle recomputes every count and the
    * sequentially-redacted text byte-for-byte; counts and patterns
    * come from the ONE `Pii.Patterns` battery in both engines. */
  /** The q123/q124 planted-PII corpus (Spark side): deterministic
    * addresses/IPs/phones/SSNs appended by `doc_id % 5`. */
  private def messyPiiDocs(docs: DataFrame): DataFrame = {
    val m = col("doc_id") % 5
    docs.select(col("doc_id"),
      concat(coalesce(col("text"), lit("")),
        when(m === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com now")))
        .when(m === 1, concat(lit(" from 10.0."),
          (col("doc_id") % 250).cast("string"), lit(".7 port")))
        .when(m === 2, concat(lit(" call +1415555"),
          (col("doc_id") % 10).cast("string"), lit(" today")))
        .when(m === 3, lit(" ssn 123-45-6789 leaked"))
        .otherwise(lit(""))).as("text"))
  }

  /** The same planting as a DuckDB CTE body (one source of truth for
    * both faces would be ideal, but the engines' concat syntaxes
    * differ; `PiiSpec`/q123 pin the equivalence). */
  private val messyPiiSql: String =
    s"""SELECT doc_id, COALESCE(text, '') ||
       |    CASE doc_id % 5
       |      WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |      WHEN 1 THEN ' from 10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.7 port'
       |      WHEN 2 THEN ' call +1415555' || CAST(doc_id % 10 AS VARCHAR) || ' today'
       |      WHEN 3 THEN ' ssn 123-45-6789 leaked'
       |      ELSE '' END AS t
       |  FROM documents""".stripMargin

  /** The sequential redaction chain over a SQL text expression. */
  private def redactSql(input: String): String =
    Pii.Patterns.foldLeft(input) {
      case (acc, (_, pat, token)) =>
        s"regexp_replace($acc, '$pat', '$token', 'g')"
    }

  def piiRedact(s: SparkSession, d: String): DataFrame =
    Pii.redact(messyPiiDocs(Tables.documents(s, d))).orderBy(col("doc_id"))

  def piiRedactOracle: String = {
    val counts = Pii.Patterns.map { case (kind, pat, _) =>
      s"CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$kind"
    }.mkString(",\n       |  ")
    val clean = redactSql("t")
    val total = Pii.Patterns.map { case (kind, _, _) => s"n_$kind" }
      .mkString(" + ")
    s"""WITH messy AS (
       |  $messyPiiSql
       |), c AS (
       |  SELECT doc_id,
       |  $counts,
       |  $clean AS clean_text
       |  FROM messy
       |)
       |SELECT doc_id, ${Pii.Patterns.map(p => "n_" + p._1).mkString(", ")},
       |  CAST($total AS BIGINT) AS n_pii, clean_text
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Stupid-backoff trigram LM (q125): score the WHOLE corpus under
    * the train band's LM ([[QualityScore.backoffLmScore]]) — the
    * cross-split scoring that makes the backoff chain fire (q107
    * scores a corpus under itself, where every gram is seen). Exact
    * integers end-to-end (α = 0.4 as ×2/÷5); the oracle replays the
    * split, all three ref n-gram relations, the five-way occurrence
    * join, and the tiered CASE. */
  def backoffLm(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val split = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .select(col("doc_id"), col("split"))
    val ref = docs.join(split.filter(col("split") === "train")
      .select(col("doc_id")), Seq("doc_id"), "left_semi")
    QualityScore.backoffLmScore(docs, ref)
      .join(split, Seq("doc_id"))
      .select(col("doc_id"), col("split"), col("n_trigrams"),
        col("sum_s_fp"), col("min_s_fp"), col("n_hit3"), col("n_bo2"),
        col("n_bo1"), col("n_oov"))
      .orderBy(col("doc_id"))
  }

  def backoffLmOracle: String = backoffLmOracleSql(pruned = false)

  /** Shared SQL for q125 (full LM) and q135 (pruned LM): identical
    * train-split model build and scoring chain; the pruned variant
    * inserts the count-cutoff + per-prefix top-K CTEs (closure via the
    * IN-subquery semi-joins, binary-collation tie order matching
    * Spark's UTF8String byte comparison) and redirects the score
    * joins at the pruned relations. n1 stays the FULL corpus mass in
    * both, mirroring [[QualityScore.backoffLmScorePruned]]. */
  private def backoffLmOracleSql(pruned: Boolean): String = {
    val key = "substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)"
    val fp = 1L << 20
    val (t3, t2, t1) =
      if (pruned) ("c3k", "c2k", "c1k") else ("c3", "c2", "c1")
    val pruneCtes = if (!pruned) "" else
      s""", c1k AS MATERIALIZED (
         |  SELECT w, c FROM c1 WHERE c >= $PrunedLmMinCount
         |), c2k AS MATERIALIZED (
         |  SELECT g, c FROM (
         |    SELECT g, c, row_number() OVER (
         |      PARTITION BY string_split(g, ' ')[1]
         |      ORDER BY c DESC, g ASC) AS r
         |    FROM c2 WHERE c >= $PrunedLmMinCount
         |      AND string_split(g, ' ')[1] IN (SELECT w FROM c1k)
         |  ) WHERE r <= $PrunedLmTopK
         |), c3k AS MATERIALIZED (
         |  SELECT g, c FROM (
         |    SELECT g, c, row_number() OVER (
         |      PARTITION BY p ORDER BY c DESC, g ASC) AS r
         |    FROM (
         |      SELECT g, c,
         |        array_to_string(string_split(g, ' ')[1:2], ' ') AS p
         |      FROM c3 WHERE c >= $PrunedLmMinCount)
         |    WHERE p IN (SELECT g FROM c2k)
         |  ) WHERE r <= $PrunedLmTopK
         |)""".stripMargin
    s"""WITH sp AS (
       |  SELECT doc_id,
       |    CASE WHEN $key < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN $key < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |), rtk AS MATERIALIZED (
       |  SELECT list_filter(string_split_regex(lower(d.text), '${Tok.WS}'),
       |    x -> x <> '') AS toks
       |  FROM documents d JOIN sp ON d.doc_id = sp.doc_id
       |  WHERE sp.split = 'train'
       |), c1 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(toks) AS w FROM rtk) GROUP BY 1
       |), c2 AS MATERIALIZED (
       |  SELECT g, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i + 1])) AS g
       |    FROM rtk WHERE len(toks) >= 2) GROUP BY 1
       |), c3 AS MATERIALIZED (
       |  SELECT g, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
       |    FROM rtk WHERE len(toks) >= 3) GROUP BY 1
       |)$pruneCtes, n1 AS (
       |  SELECT COALESCE(SUM(c), 0) AS n FROM c1
       |), etk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '${Tok.WS}'),
       |      x -> x <> '') AS toks
       |  FROM documents
       |), occ AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g3,
       |    unnest(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i + 1])) AS g2p,
       |    unnest(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i + 1] || ' ' || toks[i + 2])) AS g2s,
       |    unnest(list_transform(range(1, len(toks) - 1), i -> toks[i + 1])) AS w2,
       |    unnest(list_transform(range(1, len(toks) - 1), i -> toks[i + 2])) AS w3
       |  FROM etk WHERE len(toks) >= 3
       |), sc AS MATERIALIZED (
       |  SELECT occ.doc_id,
       |    CASE WHEN t3.c IS NOT NULL THEN (t3.c * $fp) // p2.c
       |         WHEN s2.c IS NOT NULL THEN (2 * s2.c * $fp) // (5 * u2.c)
       |         WHEN u3.c IS NOT NULL THEN (4 * u3.c * $fp) // (25 * n1.n)
       |         ELSE 0 END AS s,
       |    CASE WHEN t3.c IS NOT NULL THEN 1 ELSE 0 END AS h3,
       |    CASE WHEN t3.c IS NULL AND s2.c IS NOT NULL THEN 1 ELSE 0 END AS h2,
       |    CASE WHEN t3.c IS NULL AND s2.c IS NULL AND u3.c IS NOT NULL
       |      THEN 1 ELSE 0 END AS h1,
       |    CASE WHEN t3.c IS NULL AND s2.c IS NULL AND u3.c IS NULL
       |      THEN 1 ELSE 0 END AS h0
       |  FROM occ
       |  LEFT JOIN $t3 t3 ON occ.g3 = t3.g
       |  LEFT JOIN $t2 p2 ON occ.g2p = p2.g
       |  LEFT JOIN $t2 s2 ON occ.g2s = s2.g
       |  LEFT JOIN $t1 u2 ON occ.w2 = u2.w
       |  LEFT JOIN $t1 u3 ON occ.w3 = u3.w
       |  CROSS JOIN n1
       |), pd AS (
       |  SELECT doc_id, COUNT(*) AS n, SUM(s) AS ssum, MIN(s) AS smin,
       |    SUM(h3) AS n3, SUM(h2) AS n2, SUM(h1) AS nb1, SUM(h0) AS n0
       |  FROM sc GROUP BY 1
       |)
       |SELECT d.doc_id, sp.split,
       |  CAST(COALESCE(pd.n, 0) AS BIGINT) AS n_trigrams,
       |  CAST(COALESCE(pd.ssum, 0) AS BIGINT) AS sum_s_fp,
       |  CAST(COALESCE(pd.smin, 0) AS BIGINT) AS min_s_fp,
       |  CAST(COALESCE(pd.n3, 0) AS BIGINT) AS n_hit3,
       |  CAST(COALESCE(pd.n2, 0) AS BIGINT) AS n_bo2,
       |  CAST(COALESCE(pd.nb1, 0) AS BIGINT) AS n_bo1,
       |  CAST(COALESCE(pd.n0, 0) AS BIGINT) AS n_oov
       |FROM documents d
       |JOIN sp ON d.doc_id = sp.doc_id
       |LEFT JOIN pd ON d.doc_id = pd.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q135's pruning bounds — aggressive enough that pruning visibly
    * fires on the sf corpora (topK 3 cuts real continuation lists). */
  private val PrunedLmMinCount = 2L
  private val PrunedLmTopK = 3

  /** Pruned-LM cross-split scoring (q135): q125's exact shape under
    * [[QualityScore.backoffLmScorePruned]] — the batch face of the
    * production-bounded online LM (count-cutoff + per-prefix top-K,
    * closure-complete, full-mass normalizer). The oracle replays the
    * pruning in SQL, so the driver hash-pins that a pruned gram
    * degrades through the backoff chain exactly like an unseen one.
    * Cost note: the pruning windows and closure semi-joins run over
    * the VOCABULARY-sized gram relations (never corpus rows), but
    * they are real extra exchanges vs q125 — this is train-once model
    * construction (a production pipeline builds the pruned LM once
    * and scores forever), so the scoring steady state is q125's. */
  def backoffLmPruned(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val split = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
      .select(col("doc_id"), col("split"))
    val ref = docs.join(split.filter(col("split") === "train")
      .select(col("doc_id")), Seq("doc_id"), "left_semi")
    QualityScore.backoffLmScorePruned(docs, ref,
        minCount = PrunedLmMinCount, topK = PrunedLmTopK)
      .join(split, Seq("doc_id"))
      .select(col("doc_id"), col("split"), col("n_trigrams"),
        col("sum_s_fp"), col("min_s_fp"), col("n_hit3"), col("n_bo2"),
        col("n_bo1"), col("n_oov"))
      .orderBy(col("doc_id"))
  }

  def backoffLmPrunedOracle: String = backoffLmOracleSql(pruned = true)

  /** Sentence-level dedup (q126): [[Spans.sentenceDedup]] — the C4
    * sentence-span dedup convention at this corpus's natural grain
    * (newline-free, so sentences stand in for RefinedWeb's lines);
    * metrics + keep-first removal in one pass. The synthetic corpus
    * has no sentence punctuation (each doc is one sentence), so
    * boilerplate sentences are PLANTED in-query (the q99/q123
    * `doc_id % k` convention): every 4th doc gains a shared
    * subscribe-banner, every 7th a breaking-news banner — 100+-way
    * cross-document duplicates that exercise the corpus-wide
    * keep-first rule. The oracle replays the planting, the RE2-safe
    * split, normalization, the (doc, position) keeper rule via a
    * per-hash window, and the ordered reassembly. */
  /** The q126/q129 planted-banner corpus (Spark side): shared
    * boilerplate sentences prepended by `doc_id % 4` / `% 7`. */
  private def bannerDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 0,
          lit("Subscribe to our newsletter today. ")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("Breaking news alert! ")).otherwise(lit("")),
        coalesce(col("text"), lit(""))).as("text"))

  /** The same planting as a DuckDB CTE body. */
  private val bannerSql: String =
    """SELECT doc_id,
      |    (CASE WHEN doc_id % 4 = 0
      |       THEN 'Subscribe to our newsletter today. ' ELSE '' END) ||
      |    (CASE WHEN doc_id % 7 = 0
      |       THEN 'Breaking news alert! ' ELSE '' END) ||
      |    COALESCE(text, '') AS text
      |  FROM documents""".stripMargin

  def sentenceDedupQ(s: SparkSession, d: String): DataFrame =
    Spans.sentenceDedup(bannerDocs(Tables.documents(s, d)), "doc_id", "text")
      .orderBy(col("doc_id"))

  def sentenceDedupOracle: String =
    s"""WITH planted AS (
       |  $bannerSql
       |), base AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(
       |      string_split_regex(lower(COALESCE(text, '')), '[.!?]+${Tok.WS}'),
       |      s -> regexp_replace(trim(s), '[.!?]+$$', '')), s -> s <> '') AS sl
       |  FROM planted
       |), occ AS (
       |  SELECT doc_id, unnest(sl) AS sn,
       |    generate_subscripts(sl, 1) - 1 AS j
       |  FROM base
       |), fl AS (
       |  SELECT doc_id, j, sn,
       |    CASE WHEN COUNT(*) OVER (PARTITION BY substring(md5(sn), 1, 16)) > 1
       |      THEN 1 ELSE 0 END AS dup,
       |    CASE WHEN row_number() OVER (
       |        PARTITION BY substring(md5(sn), 1, 16) ORDER BY doc_id, j) = 1
       |      THEN 1 ELSE 0 END AS keep
       |  FROM occ
       |), pd AS (
       |  SELECT doc_id, COUNT(*) AS n_sents, SUM(dup) AS n_dup_sents,
       |    SUM(keep) AS n_kept,
       |    COALESCE(string_agg(CASE WHEN keep = 1 THEN sn END, '. '
       |      ORDER BY j), '') AS clean_text
       |  FROM fl GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(pd.n_sents, 0) AS BIGINT) AS n_sents,
       |  CAST(COALESCE(pd.n_dup_sents, 0) AS BIGINT) AS n_dup_sents,
       |  CAST(COALESCE(pd.n_kept, 0) AS BIGINT) AS n_kept,
       |  COALESCE(pd.clean_text, '') AS clean_text
       |FROM planted d LEFT JOIN pd ON d.doc_id = pd.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Zipf slope card (q127): [[CorpusStats.zipfCard]] — the
    * distributional sanity check, exact rational slope over the
    * top-1000 token frequencies. The oracle replays the histogram,
    * the (count desc, token asc) top-k ranking, both log chains, and
    * the normal-equation arithmetic. */
  def zipfCardQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.zipfCard(Tables.documents(s, d))

  def zipfCardOracle: String =
    s"""WITH hist AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(list_filter(
       |      string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS w
       |    FROM documents) GROUP BY 1
       |), tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS v,
       |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t FROM hist
       |), top AS MATERIALIZED (
       |  SELECT w, c FROM hist ORDER BY c DESC, w ASC LIMIT 1000
       |), rk AS (
       |  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT) AS r
       |  FROM top
       |), lv AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT c AS v FROM rk UNION SELECT r FROM rk)
       |), ${FixedLogSql.logCtes()}, xy AS (
       |  SELECT lr.lg AS x, lc.lg AS y
       |  FROM rk JOIN llog lr ON lr.v = rk.r JOIN llog lc ON lc.v = rk.c
       |), s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM xy
       |)
       |SELECT tot.v AS n_vocab, tot.t AS n_tokens, s.n AS n_fit,
       |  CAST(s.n * s.sxy - s.sx * s.sy AS BIGINT) AS slope_num,
       |  CAST(s.n * s.sxx - s.sx * s.sx AS BIGINT) AS slope_den,
       |  CAST(CASE WHEN (s.n * s.sxx - s.sx * s.sx) < 1000 THEN 0
       |    WHEN (s.n * s.sxy - s.sx * s.sy) >= 0
       |      THEN (s.n * s.sxy - s.sx * s.sy)
       |        // ((s.n * s.sxx - s.sx * s.sx) // 1000)
       |    ELSE -((-(s.n * s.sxy - s.sx * s.sy))
       |        // ((s.n * s.sxx - s.sx * s.sx) // 1000)) END AS BIGINT)
       |    AS slope_milli
       |FROM tot, s""".stripMargin

  /** q128's global token budget: deliberately BELOW the sf corpus
    * token mass (~27k at sf0.01) so the per-source prefix rule
    * actually selects (the q118 100k budget would admit everything —
    * a degenerate plan). */
  private val EpochPlanBudget = 10000L

  /** Epoch PLAN (q128): the final-assembly artifact a training loader
    * actually consumes, composed from the mixing family — √-temperature
    * apportionment of a global token budget across sources (q118) →
    * per-source hash-order prefix selection up to each quota (q83's
    * banded sampler, budgets from the apportionment) → deterministic
    * epoch shuffle + sharding of the selected set (q122). Output:
    * (doc_id, source, n_tokens, shard, pos) — "which documents, in
    * which shard, in what order, for epoch 0". The quota collect is
    * nSources rows (bounded, the centroid-collect convention). The
    * oracle recomputes all three stages as one chain. */
  def epochPlan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // token counts feed the apportionment collect AND the sampler;
    // the selected set feeds the shuffle AND the final join — eager
    // stage materialization, the q124 convention
    val withTokens = docs.select(col("doc_id"), col("source"),
      size(expr(s"filter(split(lower(text), '${Tok.WsSqlLit}'), t -> t <> '')"))
        .cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val quotas = Packing.sqrtApportion(withTokens, "source", "n_tokens",
        EpochPlanBudget)
      .select(col("source"), col("quota"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = Packing.tokenBudgetSample(withTokens, "source", "doc_id",
      "n_tokens", quotas, defaultBudget = 0L, salt = "sel")
      .localCheckpoint(true)
    Sampling.epochShuffle(sel, "doc_id", ShuffleShards, ShuffleSalt)
      .join(sel, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  def epochPlanOracle: String =
    s"""WITH tm AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'),
       |      t -> t <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), qm AS (
       |  SELECT source, SUM(n_tokens) AS token_mass FROM tm GROUP BY source
       |), qw AS (
       |  SELECT source, token_mass,
       |    CAST(floor(sqrt(CAST(token_mass AS DOUBLE))) AS BIGINT) AS t0
       |  FROM qm
       |), qwi AS (
       |  SELECT source, token_mass,
       |    CASE WHEN t0 * t0 > token_mass THEN t0 - 1
       |         WHEN (t0 + 1) * (t0 + 1) <= token_mass THEN t0 + 1
       |         ELSE t0 END AS weight
       |  FROM qw
       |), qtot AS (
       |  SELECT SUM(weight) AS tw FROM qwi
       |), qb AS (
       |  SELECT qwi.source, qwi.weight,
       |    ($EpochPlanBudget * qwi.weight) // qtot.tw AS base,
       |    ($EpochPlanBudget * qwi.weight) % qtot.tw AS rem
       |  FROM qwi, qtot
       |), qlo AS (
       |  SELECT $EpochPlanBudget - SUM(base) AS leftover FROM qb
       |), qr AS (
       |  SELECT qb.*, row_number() OVER (ORDER BY qb.rem DESC, qb.source ASC) AS rr
       |  FROM qb
       |), quota AS (
       |  SELECT qr.source,
       |    qr.base + CASE WHEN qr.rr <= qlo.leftover THEN 1 ELSE 0 END AS quota
       |  FROM qr, qlo
       |), sh AS (
       |  SELECT tm.doc_id, tm.source, tm.n_tokens,
       |    substring(md5(CAST(tm.doc_id AS VARCHAR) || 'sel'), 1, 8) AS hk
       |  FROM tm WHERE tm.n_tokens IS NOT NULL
       |), sc AS (
       |  SELECT doc_id, source, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM sh
       |), sel AS MATERIALIZED (
       |  SELECT sc.doc_id, sc.source, sc.n_tokens
       |  FROM sc JOIN quota ON sc.source = quota.source
       |  WHERE sc.cum <= quota.quota
       |), k AS (
       |  SELECT doc_id, source, n_tokens,
       |    substring(md5(CAST(doc_id AS VARCHAR) || '$ShuffleSalt'), 1, 8) AS key
       |  FROM sel
       |), ks AS (
       |  SELECT doc_id, source, n_tokens, key,
       |    CAST('0x' || key AS BIGINT) % $ShuffleShards AS shard
       |  FROM k
       |)
       |SELECT doc_id, source, n_tokens, CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
       |    AS BIGINT) AS pos
       |FROM ks ORDER BY doc_id""".stripMargin

  /** Incremental sentence dedup (q129):
    * [[Spans.sentenceDedupIncremental]] — a batch (`doc_id % 97 = 0`,
    * the q75/q99 split convention) deduped against the persisted
    * [[Spans.sentenceIndex]] of the rest of the corpus, banners
    * planted as in q126 so cross-side duplicates exist. Steady-state
    * semantics: indexed sentences always win (arrival order beats doc
    * ids); the batch-internal remainder follows the q126 keep-first
    * rule. The oracle rebuilds the index hash set and replays both
    * rules. */
  def sentenceDedupIncQ(s: SparkSession, d: String): DataFrame = {
    val planted = bannerDocs(Tables.documents(s, d))
    val corpus = planted.filter(col("doc_id") % 97 =!= 0)
    val batch = planted.filter(col("doc_id") % 97 === 0)
    Spans.sentenceDedupIncremental(batch,
        Spans.sentenceIndex(corpus, "doc_id", "text"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  def sentenceDedupIncOracle: String =
    s"""WITH planted AS (
       |  $bannerSql
       |), cs AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(
       |      string_split_regex(lower(COALESCE(text, '')), '[.!?]+${Tok.WS}'),
       |      s -> regexp_replace(trim(s), '[.!?]+$$', '')), s -> s <> '') AS sl
       |  FROM planted WHERE doc_id % 97 <> 0
       |), ixh AS MATERIALIZED (
       |  SELECT DISTINCT substring(md5(sn), 1, 16) AS h
       |  FROM (SELECT unnest(sl) AS sn FROM cs)
       |), bs AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(
       |      string_split_regex(lower(COALESCE(text, '')), '[.!?]+${Tok.WS}'),
       |      s -> regexp_replace(trim(s), '[.!?]+$$', '')), s -> s <> '') AS sl
       |  FROM planted WHERE doc_id % 97 = 0
       |), bocc AS (
       |  SELECT doc_id, unnest(sl) AS sn,
       |    generate_subscripts(sl, 1) - 1 AS j
       |  FROM bs
       |), fl0 AS MATERIALIZED (
       |  SELECT b.doc_id, b.j, b.sn,
       |    substring(md5(b.sn), 1, 16) AS h,
       |    CASE WHEN ixh.h IS NOT NULL THEN 1 ELSE 0 END AS inix
       |  FROM bocc b LEFT JOIN ixh ON substring(md5(b.sn), 1, 16) = ixh.h
       |), fl AS (
       |  SELECT doc_id, j, sn, inix AS dup_ix,
       |    CASE WHEN inix = 0 AND COUNT(*) OVER (PARTITION BY h) > 1
       |      THEN 1 ELSE 0 END AS dup_b,
       |    CASE WHEN inix = 0 AND row_number() OVER (
       |        PARTITION BY h ORDER BY doc_id, j) = 1
       |      THEN 1 ELSE 0 END AS keep
       |  FROM fl0
       |), pd AS (
       |  SELECT doc_id, COUNT(*) AS n_sents, SUM(dup_ix) AS n_dup_index,
       |    SUM(dup_b) AS n_dup_batch, SUM(keep) AS n_kept,
       |    COALESCE(string_agg(CASE WHEN keep = 1 THEN sn END, '. '
       |      ORDER BY j), '') AS clean_text
       |  FROM fl GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(pd.n_sents, 0) AS BIGINT) AS n_sents,
       |  CAST(COALESCE(pd.n_dup_index, 0) AS BIGINT) AS n_dup_index,
       |  CAST(COALESCE(pd.n_dup_batch, 0) AS BIGINT) AS n_dup_batch,
       |  CAST(COALESCE(pd.n_kept, 0) AS BIGINT) AS n_kept,
       |  COALESCE(pd.clean_text, '') AS clean_text
       |FROM (SELECT doc_id FROM planted WHERE doc_id % 97 = 0) d
       |LEFT JOIN pd ON d.doc_id = pd.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Deterministic span corruption (q130): [[Corruption.spanCorrupt]]
    * — T5-style denoising pairs with the mask a pure function of
    * (doc, position, salt), sentinels merged per contiguous run. The
    * oracle replays the per-token keyspace test, the run windows, the
    * sentinel numbering, and both reassembled texts byte-for-byte. */
  def spanCorruptQ(s: SparkSession, d: String): DataFrame =
    Corruption.spanCorrupt(Tables.documents(s, d), "doc_id", "text",
        rate = 0.15, salt = "cor0")
      .orderBy(col("doc_id"))

  def spanCorruptOracle: String = {
    val thresh = Sampling.hexThreshold(0.15)
    s"""WITH tok0 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(COALESCE(text, '')), '${Tok.WS}'),
       |      t -> t <> '') AS toks
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS t,
       |    generate_subscripts(toks, 1) - 1 AS i
       |  FROM tok0
       |), mk AS (
       |  SELECT doc_id, i, t,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(i AS VARCHAR) || ':' || 'cor0'), 1, 8) < '$thresh'
       |      THEN 1 ELSE 0 END AS m
       |  FROM tok
       |), rn AS (
       |  SELECT doc_id, i, t, m,
       |    CASE WHEN m = 1 AND COALESCE(lag(m) OVER w, 0) = 0
       |      THEN 1 ELSE 0 END AS st
       |  FROM mk
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
       |), rk AS (
       |  SELECT doc_id, i, t, m, st,
       |    SUM(st) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS k
       |  FROM rn
       |), pieces AS (
       |  SELECT doc_id, i, m, st,
       |    CASE WHEN m = 0 THEN t
       |         WHEN st = 1 THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
       |    END AS inp,
       |    CASE WHEN m = 1 THEN
       |      CASE WHEN st = 1
       |        THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || t
       |        ELSE t END
       |    END AS tg
       |  FROM rk
       |), pd AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(m) AS n_masked,
       |    SUM(st) AS n_spans,
       |    COALESCE(string_agg(inp, ' ' ORDER BY i), '') AS input_text,
       |    COALESCE(string_agg(tg, ' ' ORDER BY i), '') AS target_text
       |  FROM pieces GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(pd.n_masked, 0) AS BIGINT) AS n_masked,
       |  CAST(COALESCE(pd.n_spans, 0) AS BIGINT) AS n_spans,
       |  COALESCE(pd.input_text, '') AS input_text,
       |  COALESCE(pd.target_text, '') AS target_text
       |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Heaps'-law vocabulary growth (q131): [[CorpusStats.heapsCurve]]
    * — cumulative tokens and distinct vocabulary in doc-id order,
    * banded prefix sums engine-side; the oracle's plain global
    * windows recompute the same curve. */
  def heapsCurveQ(s: SparkSession, d: String): DataFrame =
    CorpusStats.heapsCurve(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  def heapsCurveOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS w
       |  FROM documents
       |), pdt AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM tok GROUP BY 1
       |), fs AS (
       |  SELECT w, MIN(doc_id) AS fd FROM tok GROUP BY 1
       |), pdn AS (
       |  SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS n_new
       |  FROM fs GROUP BY 1
       |), b AS (
       |  SELECT d.doc_id,
       |    COALESCE(pdt.n_tokens, 0) AS n_tokens,
       |    COALESCE(pdn.n_new, 0) AS n_new
       |  FROM documents d
       |  LEFT JOIN pdt ON d.doc_id = pdt.doc_id
       |  LEFT JOIN pdn ON d.doc_id = pdn.doc_id
       |)
       |SELECT doc_id, n_tokens, n_new AS n_new_tokens,
       |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       |  CAST(SUM(n_new) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
       |FROM b ORDER BY doc_id""".stripMargin

  /** q132's budget and epoch cap: at maxEpochs = 1 and budget 25,000
    * (< the ~27k corpus mass) the sf corpora produce a MIXED outcome —
    * some sources capped at their full mass, the rest water-leveled. */
  private val UnimaxBudget = 25000L

  /** UniMax allocation (q132): [[Packing.unimaxAllocate]] — the
    * repetition-capped counterpart to q118's √-temperature mix
    * (Chung et al. 2022), exact-integer water-filling. The oracle
    * replays the cap sort, the cross-multiplied feasibility test on
    * prefix sums, and the leftover split with its remainder order. */
  def unimaxAllocateQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val withTokens = docs.select(col("source"),
      size(expr(s"filter(split(lower(text), '${Tok.WsSqlLit}'), t -> t <> '')"))
        .cast("long").as("n_tokens"))
    Packing.unimaxAllocate(withTokens, "source", "n_tokens",
        UnimaxBudget, maxEpochs = 1L)
      .orderBy(col("source"))
  }

  def unimaxAllocateOracle: String =
    s"""WITH m AS (
       |  SELECT source,
       |    CAST(SUM(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'),
       |      t -> t <> ''))) AS BIGINT) AS token_mass
       |  FROM documents GROUP BY source
       |), c AS (
       |  SELECT source, token_mass, token_mass * 1 AS cap FROM m
       |), nn AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c
       |), s AS (
       |  SELECT c.source, c.token_mass, c.cap, nn.n,
       |    CAST(row_number() OVER (ORDER BY c.cap, c.source) AS BIGINT) AS k,
       |    COALESCE(SUM(c.cap) OVER (ORDER BY c.cap, c.source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
       |  FROM c, nn
       |), f AS (
       |  SELECT *,
       |    CASE WHEN cap * (n - k + 1) <= $UnimaxBudget - p
       |      THEN 1 ELSE 0 END AS capped
       |  FROM s
       |), g AS (
       |  SELECT SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END) AS fc,
       |    SUM(1 - capped) AS u
       |  FROM f
       |), r AS (
       |  SELECT f.*, ($UnimaxBudget - g.fc) AS lft, g.u,
       |    CAST(row_number() OVER (ORDER BY f.capped, f.source) AS BIGINT) AS ur
       |  FROM f, g
       |)
       |SELECT source, token_mass, CAST(cap AS BIGINT) AS cap,
       |  CAST(capped AS BIGINT) AS capped,
       |  CAST(CASE WHEN capped = 1 THEN cap
       |       WHEN u > 0 THEN (lft // u)
       |         + (CASE WHEN ur <= lft % u THEN 1 ELSE 0 END)
       |       ELSE 0 END AS BIGINT) AS quota
       |FROM r ORDER BY source""".stripMargin

  /** q124's entropy floor (milli-bits/char; the sf corpus spans
    * ~3680–4240, so 4000 splits it). */
  private val EntropyFloor = 4000L

  /** Curation funnel v2 (q124): the round-12 operator family composed
    * end-to-end — PII scrub (q123 planting + battery) → char-fraction
    * repetition gate (q119) → entropy floor (q121) → canonical dedup
    * survivors (q116) → DSIR above-mean selection (q120, strictly
    * above the stage-corpus mean by integer cross-multiply; the
    * absolute weights are smoothing-shifted, the mean split is not).
    * Emits (stage, n_docs) — the funnel diagnostic. Every stage is
    * recomputed by ONE independent DuckDB oracle (the q103 capstone
    * convention); the two log-chain instantiations use distinct
    * prefixes. Per-doc gates commute, so both engines compute the
    * repetition/entropy flags over the full scrubbed corpus; the
    * set-dependent stages (dedup, DSIR) run on exactly their stage
    * input. */
  def curationFunnel2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // Stage outputs are eagerly localCheckpoint'ed (the Bpe.train
    // precedent): each stage frame feeds BOTH the next stage and its
    // own funnel count (and s4 feeds DSIR twice — raw + target), so
    // without materialization Spark re-evaluates the shared subtree
    // per consumer — measured 84 s → the sum-of-stages at 10×. A
    // production funnel persists stage outputs to storage for exactly
    // this reason; the checkpoint is the single-JVM stand-in.
    def cp(df: DataFrame): DataFrame = df.localCheckpoint(true)
    val clean = cp(Pii.redact(messyPiiDocs(docs))
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id")))
    // Round 18: the gate stages cut ID frames, not document frames.
    // Both per-doc gate metrics land in ONE materialized (doc_id,
    // keep_rep, keep_ent) relation (they are computed over the full
    // scrubbed corpus either way — per-doc gates commute); the stage
    // frames s2/s3/s4 are then cheap broadcast-semi rebuilds over the
    // cached `clean` blocks instead of three more text-sized eager
    // barriers. Stage counts are unchanged: doc_id is unique in
    // `clean`, so |clean ⋈ ids| = |ids| for every gate id set.
    val flags = cp(QualityScore.repetitionCharMetrics(clean)
      .select(col("doc_id"), col("keep_rep"))
      .join(QualityScore.charEntropy(clean)
        .select(col("doc_id"),
          (col("milli_bits_per_char") >= EntropyFloor).as("keep_ent")),
        Seq("doc_id")))
    val ids2 = flags.filter(col("keep_rep") === 1).select(col("doc_id"))
    val ids3 = flags.filter(col("keep_rep") === 1 && col("keep_ent"))
      .select(col("doc_id"))
    val s3 = clean.join(ids3, Seq("doc_id"))
    val ids4 = cp(s3.join(DedupOps.canonicalDedup(s3)
      .select(col("canonical_id").as("doc_id")), Seq("doc_id"))
      .select(col("doc_id")))
    val s4 = clean.join(ids4, Seq("doc_id"))
    val dsir = cp(Importance.importanceWeights(s4,
      s4.filter(col("source") === DsirTarget), buckets = DsirBuckets))
    val tot = dsir.agg(sum(col("weight_fp")).as("__tw"),
      count(lit(1)).as("__tn"))
    val s5 = s4.join(dsir.crossJoin(broadcast(tot))
      .filter(col("weight_fp") * col("__tn") > col("__tw"))
      .select(col("doc_id")), Seq("doc_id"))
    def stage(nm: String, df: DataFrame) =
      df.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(nm).as("stage"), col("n_docs"))
    Seq(("0_input", docs), ("1_scrubbed", clean), ("2_repetition", ids2),
      ("3_entropy", ids3), ("4_canonical", ids4), ("5_dsir", s5))
      .map((stage _).tupled).reduce(_.unionByName(_))
      .orderBy(col("stage"))
  }

  def curationFunnel2Oracle: String =
    s"""WITH messy AS (
       |  $messyPiiSql
       |), clean AS (
       |  SELECT doc_id, ${redactSql("t")} AS text FROM messy
       |), cd AS MATERIALIZED (
       |  SELECT c.doc_id, c.text, d.source
       |  FROM clean c JOIN documents d ON c.doc_id = d.doc_id
       |), rtok0 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '${Tok.WS}'), x -> x <> '') AS toks
       |  FROM cd
       |), rtok AS (
       |  SELECT doc_id, unnest(toks) AS t,
       |    generate_subscripts(toks, 1) - 1 AS i
       |  FROM rtok0
       |), rpos AS MATERIALIZED (
       |  SELECT doc_id, i, t,
       |    COALESCE(SUM(length(t) + 1) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
       |    CAST(length(t) AS BIGINT) AS len,
       |    CASE WHEN lead(t, 1) OVER w IS NOT NULL
       |      THEN concat_ws(' ', t, lead(t, 1) OVER w) END AS gtop,
       |    CASE WHEN lead(t, 4) OVER w IS NOT NULL
       |      THEN concat_ws(' ', t, lead(t, 1) OVER w, lead(t, 2) OVER w,
       |        lead(t, 3) OVER w, lead(t, 4) OVER w) END AS gdup
       |  FROM rtok
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
       |), rnc AS (
       |  SELECT doc_id, SUM(len) + COUNT(*) - 1 AS n_chars
       |  FROM rpos GROUP BY doc_id
       |), rtc AS (
       |  SELECT doc_id, gtop, COUNT(*) AS c
       |  FROM rpos WHERE gtop IS NOT NULL GROUP BY doc_id, gtop
       |), rtop AS (
       |  SELECT doc_id, c * length(gtop) AS top_chars
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY c DESC, gtop ASC) AS rn FROM rtc)
       |  WHERE rn = 1
       |), rdc AS (
       |  SELECT doc_id, gdup FROM rpos WHERE gdup IS NOT NULL
       |  GROUP BY doc_id, gdup HAVING COUNT(*) > 1
       |), rocc AS (
       |  SELECT p.doc_id, p.s, p.s + length(p.gdup) - 1 AS e
       |  FROM rpos p JOIN rdc ON p.doc_id = rdc.doc_id AND p.gdup = rdc.gdup
       |), rcov AS (
       |  SELECT doc_id, s, e,
       |    GREATEST(s - 1, COALESCE(MAX(e) OVER (PARTITION BY doc_id
       |      ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1)) AS fl
       |  FROM rocc
       |), rdup AS (
       |  SELECT doc_id, SUM(GREATEST(e - fl, 0)) AS dup_chars
       |  FROM rcov GROUP BY doc_id
       |), rkeep AS MATERIALIZED (
       |  SELECT cd.doc_id FROM cd
       |  LEFT JOIN rnc ON cd.doc_id = rnc.doc_id
       |  LEFT JOIN rtop ON cd.doc_id = rtop.doc_id
       |  LEFT JOIN rdup ON cd.doc_id = rdup.doc_id
       |  WHERE COALESCE(rtop.top_chars, 0) * 5 <= COALESCE(rnc.n_chars, 0)
       |    AND COALESCE(rdup.dup_chars, 0) * 20 <= COALESCE(rnc.n_chars, 0) * 3
       |), ech AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, length(text) + 1), ci -> text[ci:ci])) AS c
       |  FROM cd WHERE text IS NOT NULL AND length(text) > 0
       |), ecnt AS (
       |  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM ech GROUP BY 1, 2
       |), etot AS (
       |  SELECT doc_id, SUM(n) AS nn FROM ecnt GROUP BY 1
       |), ev AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT n AS v FROM ecnt UNION SELECT nn FROM etot)
       |), ${FixedLogSql.logCtes(16, "e")}, esl AS (
       |  SELECT ecnt.doc_id, SUM(ecnt.n * l.lg) AS slg
       |  FROM ecnt JOIN elog l ON l.v = ecnt.n GROUP BY 1
       |), ekeep AS MATERIALIZED (
       |  SELECT etot.doc_id FROM etot
       |  JOIN elog ln2 ON ln2.v = etot.nn
       |  JOIN esl ON esl.doc_id = etot.doc_id
       |  WHERE ((etot.nn * ln2.lg - esl.slg) * 1000) // (etot.nn * 65536)
       |    >= $EntropyFloor
       |), s3 AS MATERIALIZED (
       |  SELECT cd.* FROM cd
       |  JOIN rkeep ON cd.doc_id = rkeep.doc_id
       |  JOIN ekeep ON cd.doc_id = ekeep.doc_id
       |), canon AS (
       |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
       |      '[[:punct:]]', '', 'g'), '\\s+', ' ', 'g'))) AS ch,
       |    MIN(doc_id) AS keep_id
       |  FROM s3 GROUP BY 1
       |), s4 AS MATERIALIZED (
       |  SELECT s3.* FROM s3 JOIN canon ON s3.doc_id = canon.keep_id
       |), dgr AS (
       |  SELECT doc_id, source, unnest(list_concat(toks,
       |    CASE WHEN len(toks) >= 2
       |      THEN list_transform(range(1, len(toks)),
       |             bi -> concat_ws(' ', toks[bi], toks[bi + 1]))
       |      ELSE [] END)) AS g
       |  FROM (SELECT doc_id, source,
       |    list_filter(string_split_regex(lower(text), '${Tok.WS}'), x -> x <> '') AS toks
       |    FROM s4)
       |), docc AS (
       |  SELECT doc_id, source,
       |    CAST(${MinhashMirrorSql.fnvSql("g")} % $DsirBuckets AS BIGINT) AS b
       |  FROM dgr
       |), dpdb AS (
       |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM docc GROUP BY 1, 2
       |), drb AS (
       |  SELECT b, SUM(c) AS cr FROM dpdb GROUP BY 1
       |), dtb AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS ct
       |  FROM docc WHERE source = '$DsirTarget' GROUP BY 1
       |), dnrt AS (
       |  SELECT (SELECT COALESCE(SUM(cr), 0) FROM drb) AS nr,
       |         (SELECT COALESCE(SUM(ct), 0) FROM dtb) AS nt
       |), dv AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT COALESCE(dtb.ct, 0) + 1 AS v FROM drb LEFT JOIN dtb USING (b)
       |    UNION SELECT cr + 1 FROM drb
       |    UNION SELECT nr + $DsirBuckets FROM dnrt
       |    UNION SELECT nt + $DsirBuckets FROM dnrt)
       |), ${FixedLogSql.logCtes(16, "d")}, dwb AS (
       |  SELECT drb.b, lt.lg - lr.lg AS w
       |  FROM drb LEFT JOIN dtb USING (b)
       |  JOIN dlog lt ON lt.v = COALESCE(dtb.ct, 0) + 1
       |  JOIN dlog lr ON lr.v = drb.cr + 1
       |), dnrm AS (
       |  SELECT l1.lg - l2.lg AS nrm FROM dnrt
       |  JOIN dlog l1 ON l1.v = dnrt.nr + $DsirBuckets
       |  JOIN dlog l2 ON l2.v = dnrt.nt + $DsirBuckets
       |), dpd AS (
       |  SELECT dpdb.doc_id, SUM(dpdb.c) AS n, SUM(dpdb.c * dwb.w) AS sw
       |  FROM dpdb JOIN dwb ON dpdb.b = dwb.b GROUP BY 1
       |), dw AS MATERIALIZED (
       |  SELECT s4.doc_id,
       |    COALESCE(dpd.sw, 0) + COALESCE(dpd.n, 0) * dnrm.nrm AS w
       |  FROM s4 LEFT JOIN dpd ON s4.doc_id = dpd.doc_id CROSS JOIN dnrm
       |), dtot AS (
       |  SELECT SUM(w) AS tw, COUNT(*) AS tn FROM dw
       |), s5 AS (
       |  SELECT dw.doc_id FROM dw, dtot WHERE dw.w * dtot.tn > dtot.tw
       |)
       |SELECT * FROM (
       |  SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
       |  UNION ALL SELECT '1_scrubbed', CAST(COUNT(*) AS BIGINT) FROM cd
       |  UNION ALL SELECT '2_repetition', CAST(COUNT(*) AS BIGINT)
       |    FROM (SELECT cd.doc_id FROM cd JOIN rkeep ON cd.doc_id = rkeep.doc_id)
       |  UNION ALL SELECT '3_entropy', CAST(COUNT(*) AS BIGINT) FROM s3
       |  UNION ALL SELECT '4_canonical', CAST(COUNT(*) AS BIGINT) FROM s4
       |  UNION ALL SELECT '5_dsir', CAST(COUNT(*) AS BIGINT) FROM s5
       |) ORDER BY stage""".stripMargin

  /** Incremental Zipf card (q133): the corpus split into two arrival
    * batches by doc-id parity, the even batch indexed
    * ([[CorpusStats.tokenIndex]]), the odd batch folded in with
    * [[CorpusStats.tokenIndexMerge]], and the card recomputed from
    * the merged index — the steady-state form of q127. The oracle is
    * the ONE-SHOT q127 SQL: the driver's hash compare pins
    * batch ≡ incremental, the index-pattern guarantee (q75/q129
    * precedent at token grain). */
  def zipfCardIncQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val merged = CorpusStats.tokenIndexMerge(
      CorpusStats.tokenIndex(docs.filter(col("doc_id") % 2 === 0))
        .localCheckpoint(true),
      docs.filter(col("doc_id") % 2 =!= 0))
    CorpusStats.zipfCardFromIndex(merged)
  }

  def zipfCardIncOracle: String = zipfCardOracle

  /** Incremental Heaps' curve (q134): same two-batch split; the
    * merged [[CorpusStats.tokenIndex]] supplies first-seen news, the
    * append-only [[CorpusStats.docTokenCounts]] rows supply token
    * mass — oracle = the one-shot q131 SQL (batch ≡ incremental under
    * the hash compare). */
  def heapsCurveIncQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = CorpusStats.tokenIndexMerge(
      CorpusStats.tokenIndex(even).localCheckpoint(true), odd)
    val counts = CorpusStats.docTokenCounts(even)
      .unionByName(CorpusStats.docTokenCounts(odd))
    CorpusStats.heapsCurveFromIndex(merged, counts)
      .orderBy(col("doc_id"))
  }

  def heapsCurveIncOracle: String = heapsCurveOracle

  /** Incremental PCA fit (q138): the embedding corpus split into two
    * arrival batches by vec_id parity, each batch's exact moment
    * buffer computed independently ([[Embeddings.MomentsAgg]]), the
    * two persisted `(slot, val)` buffers folded with
    * [[Embeddings.momentsMerge]] (sums add, max-slot maxes — moments
    * are a mergeable sketch), and the dominant eigenvector solved
    * from the MERGED buffer. The oracle is the ONE-SHOT q137 SQL:
    * the driver's hash compare pins batch ≡ incremental for the
    * entire PCA fit — covariance accumulation AND eigensolve — the
    * steady-state form in which a 100 TB corpus actually fits PCA
    * (per-batch work ∝ batch, merge work ∝ buffer: 2,146 rows). */
  def pcaPowerInc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    def momentsOf(df: DataFrame): DataFrame = df
      .select(col("embedding")).as[Seq[Float]]
      .select(new Embeddings.MomentsAgg(EmbDim).toColumn.name("m"))
      .select(posexplode(col("m")).as(Seq("slot", "val")))
    val even = momentsOf(emb.filter(col("vec_id") % 2 === 0))
      .localCheckpoint(true)
    val merged = Embeddings.momentsMerge(
      even, momentsOf(emb.filter(col("vec_id") % 2 =!= 0)), EmbDim)
    val m: Array[Long] = merged.orderBy(col("slot"))
      .select(col("val")).as[Long].collect()
    val (v, lam) = Embeddings.powerIterationFixed(m, EmbDim, PowerIters)
    val rows = v.zipWithIndex.map { case (x, i) => (i, x.toLong) } :+
      ((EmbDim, lam.toLong))
    s.createDataFrame(rows.toIndexedSeq).toDF("slot", "val")
      .select(col("slot").cast("int").as("slot"), col("val"))
      .orderBy(col("slot"))
  }

  def pcaPowerIncOracle: String = pcaPowerOracle

  /** Incremental ANN index (q139): the steady-state 100 TB ANN shape
    * — a persisted IVF index whose coarse quantizer is trained ONCE
    * (the q95 fixed-point k-means, on the FIRST arrival batch only)
    * and then each arriving batch is assigned under the FIXED model
    * (per-batch work ∝ batch — the q75/q129/q138 index pattern; the
    * index is append-only and never rebuilt). Probe: the q15 query
    * convention (vec_id < 5), nProbe = 2 cells by integer quantized
    * distance (ties → lower cell id), exact integer squared-L2 top-5
    * within the probed cells (ties → lower vec_id). Integer
    * arithmetic end-to-end, so the oracle replays EVERYTHING —
    * quantizer training on the even half (the shared q95 CTE chain),
    * whole-corpus assignment, probe-cell selection, candidate
    * distances, final ranks — bit-for-bit. */
  /** q167 probe sweep (nProbe values; KmK = probe-everything =
    * exact). */
  private val AnnSweepProbes = Seq(1, 2, 4, KmK)

  /** ANN tuning card (q167): MEASURED recall@5 of the q139 IVF index
    * per nProbe against the EXACT integer-L2 top-5 — the q158 pattern
    * applied to similarity search (pick the probe budget from a
    * measured curve, not the uniform-cells assumption). One trained
    * model + one index; probing all KmK cells IS brute force
    * (`AnnIndexSpec` pins that identity), so the ground truth is free
    * and the whole card — centroids, assignments, every probe, the
    * rank cut, the hit join — is exact integers the oracle replays.
    * Output per config: (n_probe, hits, n_true, recall_fp ×2²⁰). */
  def annTuningCard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val centroids = Clustering.kmeansCentroids(emb, k = KmK, iters = KmIters)
    val idx = Clustering.ivfIndex(emb, centroids).localCheckpoint(true)
    val qs: Seq[(Long, Array[Long])] = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq.map { case (id, v) =>
        id -> v.map(x =>
          math.floor(x.toDouble * Clustering.Fp).toLong).toArray
      }
    val truth = Clustering.ivfProbe(idx, centroids, qs, nProbe = KmK, k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val nTrue = truth.count()
    val rows = AnnSweepProbes.map { p =>
      val hits = Clustering.ivfProbe(idx, centroids, qs, nProbe = p, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      (p.toLong, hits, nTrue,
        if (nTrue > 0) hits * LshCardFp / nTrue else 0L)
    }
    s.createDataFrame(rows)
      .toDF("n_probe", "hits", "n_true", "recall_fp")
      .orderBy(col("n_probe"))
  }

  def annTuningCardOracle: String = {
    val probes = AnnSweepProbes.map { p =>
      s"""probe_$p AS (
         |  SELECT vec_id AS query_id, cl FROM (
         |    SELECT vec_id, cl,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |    FROM adist WHERE vec_id < 5) WHERE rn <= $p
         |), top_$p AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM (
         |    SELECT c.query_id, c.vec_id,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY c.dist, c.vec_id) AS rank
         |    FROM (
         |      SELECT p.query_id, i.vec_id,
         |        CAST(SUM((a.comp - b.comp)*(a.comp - b.comp)) AS BIGINT) AS dist
         |      FROM probe_$p p JOIN idx i ON i.cl = p.cl AND i.vec_id <> p.query_id
         |      JOIN qe2 a ON a.vec_id = p.query_id
         |      JOIN qe2 b ON b.vec_id = i.vec_id AND b.pos = a.pos
         |      GROUP BY 1, 2
         |    ) c
         |  ) WHERE rank <= 5
         |), hit_$p AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n
         |  FROM top_$p t JOIN top_$KmK e
         |    ON e.query_id = t.query_id AND e.vec_id = t.vec_id
         |)""".stripMargin
    }.mkString(",\n")
    val rows = AnnSweepProbes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS n_probe, h.n AS hits, nt.n AS n_true,
         |  CASE WHEN nt.n > 0 THEN h.n * $LshCardFp // nt.n ELSE 0 END AS recall_fp
         |FROM hit_$p h, nt""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${kmeansCtesFrom("embeddings")},
       |qe2 AS MATERIALIZED (
       |  SELECT vec_id, comp, pos FROM qe
       |), adist AS MATERIALIZED (
       |  SELECT qe2.vec_id, c.cl,
       |    SUM((qe2.comp - c.comp)*(qe2.comp - c.comp)) AS dist
       |  FROM qe2 JOIN c$KmIters c ON c.pos = qe2.pos GROUP BY 1, 2
       |), idx AS MATERIALIZED (
       |  SELECT vec_id, cl FROM (
       |    SELECT vec_id, cl,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM adist) WHERE rn = 1
       |),
       |$probes,
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM top_$KmK)
       |SELECT * FROM (
       |$rows
       |) ORDER BY n_probe""".stripMargin
  }

  def annIndexInc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    val centroids = Clustering.kmeansCentroids(even, k = KmK, iters = KmIters)
    // persisted index: one append-only (vec_id, cluster, stored
    // quantized vector) relation, each batch assigned under the fixed
    // model — Clustering.ivfIndex, the relation the streaming twin
    // persists per batch
    val idx = Clustering.ivfIndex(even, centroids)
      .unionByName(Clustering.ivfIndex(odd, centroids))
      .localCheckpoint(true)
    // query vectors (bounded: 5) quantized with the model convention
    val qs: Seq[(Long, Array[Long])] = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toIndexedSeq.map { case (id, v) =>
        id -> v.map(x =>
          math.floor(x.toDouble * Clustering.Fp).toLong).toArray
      }
    Clustering.ivfProbe(idx, centroids, qs, nProbe = 2, k = 5)
  }

  def annIndexIncOracle: String =
    s"""WITH ${kmeansCtesFrom("(SELECT * FROM embeddings WHERE vec_id % 2 = 0)")},
       |qall AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${Clustering.Fp}) AS BIGINT)) AS qv
       |  FROM embeddings
       |), qe2 AS MATERIALIZED (
       |  SELECT vec_id, unnest(qv) AS comp, generate_subscripts(qv, 1) - 1 AS pos FROM qall
       |), adist AS MATERIALIZED (
       |  SELECT qe2.vec_id, c.cl,
       |    SUM((qe2.comp - c.comp)*(qe2.comp - c.comp)) AS dist
       |  FROM qe2 JOIN c$KmIters c ON c.pos = qe2.pos GROUP BY 1, 2
       |), idx AS MATERIALIZED (
       |  SELECT vec_id, cl FROM (
       |    SELECT vec_id, cl,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM adist) WHERE rn = 1
       |), probe AS (
       |  SELECT vec_id AS query_id, cl FROM (
       |    SELECT vec_id, cl,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM adist WHERE vec_id < 5) WHERE rn <= 2
       |), cand AS (
       |  SELECT p.query_id, i.vec_id,
       |    CAST(SUM((a.comp - b.comp)*(a.comp - b.comp)) AS BIGINT) AS dist
       |  FROM probe p JOIN idx i ON i.cl = p.cl AND i.vec_id <> p.query_id
       |  JOIN qe2 a ON a.vec_id = p.query_id
       |  JOIN qe2 b ON b.vec_id = i.vec_id AND b.pos = a.pos
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank,
       |  vec_id AS neighbor_id, dist AS sq_dist FROM (
       |  SELECT query_id, vec_id, dist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
       |  FROM cand)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** EXACT similarity self-join (q157): every document pair with
    * 3-shingle Jaccard ≥ 1/2, via prefix filtering — see
    * [[DedupOps.ppjoinExact]] for the completeness argument and the
    * 100 TB plan shape. Same output schema as q13, but q13's LSH
    * candidate set is probabilistic (both engines mirror it); here the
    * result is the full threshold join with zero false negatives —
    * the operator of record when "no duplicate survives" is a hard
    * contract. The oracle is INDEPENDENT of the prefix-filter
    * algorithm: it computes Jaccard relationally for every pair
    * sharing ANY shingle (Σ df² ≈ 2.8M partials at sf0.1 — bounded),
    * so a prefix bug that dropped a qualifying pair would hash-fail,
    * not silently agree. */
  def ppjoinPairs(s: SparkSession, d: String): DataFrame =
    DedupOps.ppjoinExact(Tables.documents(s, d))
      .orderBy(col("id_a"), col("id_b"))

  /** q158 band configs (bands → rows = 128/bands → LSH threshold
    * (1/b)^(1/r) ≈ 0.88 / 0.71 / 0.42 / 0.125): the sweep brackets
    * the 0.5 dedup threshold from both sides. */
  private val LshSweepBands = Seq(8, 16, 32, 64)

  /** Precision/recall fixed point for q158: ×2²⁰. */
  private val LshCardFp = 1L << 20

  /** LSH tuning card (q158): MEASURED precision and recall of four
    * MinHash band configurations against the EXACT threshold-join
    * ground truth (q157's [[DedupOps.ppjoinExact]]) — the card a
    * pipeline computes on a sample corpus to pick its LSH operating
    * point, instead of trusting the (1/b)^(1/r) S-curve formula that
    * assumes uniform similarity. All four configs share ONE signature
    * pass per document (128 minima — banding is just regrouping), the
    * ground truth is computed once, and the per-config numbers are
    * aggregate-row driver math (the q155 card convention). The bucket
    * cap (64) is part of the measured config, mirrored in the oracle.
    * Output per config: (bands, rows_per_band, n_cand, n_true, tp,
    * precision_fp, recall_fp) with ×2²⁰ truncating ratios. */
  def lshTuningCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val truth = DedupOps.ppjoinExact(docs)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val nTrue = truth.count()
    // ONE signature pass for all four configs (the shingle+md5 work
    // dominates; banding is column regrouping of the shared minima —
    // minhash_sig_md5 + minhashCandidatesSweep). Par.ensure: the
    // 128-permutation signature is exactly the per-row-CPU-heavy stage
    // the guard exists for (round 18 — this pass previously ran in the
    // single parquet-split scan task). All four configs' candidate
    // sets come from ONE exploded relation with `bands` as a key
    // column (one bucket exchange + one distinct instead of four
    // sequential explode+join passes — round-18 r17-VERDICT #3); the
    // per-config sets are byte-identical to the per-config path
    // (LshSweepSpec).
    val sigs = graft.util.Par.ensure(docs
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0))
      .select(col("doc_id").as("id"),
        graft.functions.Expressions.minhash_sig_md5(
          col("text"), DedupOps.NumPerm, 3).as("sig"))
      .persist()
    sigs.count()
    val cands = DedupOps.minhashCandidatesSweep(
      sigs, DedupOps.NumPerm, LshSweepBands).localCheckpoint(true)
    val nCandByB = cands.groupBy(col("bands")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tpByB = cands.join(truth, Seq("id_a", "id_b"), "left_semi")
      .groupBy(col("bands")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = LshSweepBands.map { b =>
      val nCand = nCandByB.getOrElse(b, 0L)
      val tp = tpByB.getOrElse(b, 0L)
      (b.toLong, (DedupOps.NumPerm / b).toLong, nCand, nTrue, tp,
        if (nCand > 0) tp * LshCardFp / nCand else 0L,
        if (nTrue > 0) tp * LshCardFp / nTrue else 0L)
    }
    sigs.unpersist()
    s.createDataFrame(rows).toDF("bands", "rows_per_band", "n_cand",
      "n_true", "tp", "precision_fp", "recall_fp").orderBy(col("bands"))
  }

  /** Oracle: ONE shared signature chain ([[minhashSigCtes]]), four
    * banded/bucketed/candidate chains ([[bandedCtesFor]]), the q157
    * exact-pair chain as ground truth, and the same ×2²⁰ truncating
    * ratios. */
  def lshTuningCardOracle: String = {
    val perConfig = LshSweepBands.map { b =>
      s"""${bandedCtesFor(b, s"_$b")}, bsz_$b AS (
         |  SELECT band_idx, band_key, count(*) AS n FROM banded_$b GROUP BY band_idx, band_key
         |), cand_$b AS MATERIALIZED (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM banded_$b x
         |  JOIN banded_$b y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         |    AND x.doc_id < y.doc_id
         |  JOIN bsz_$b z ON z.band_idx = x.band_idx AND z.band_key = x.band_key
         |  WHERE z.n BETWEEN 2 AND 64
         |), nc_$b AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cand_$b
         |), tp_$b AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n
         |  FROM cand_$b c JOIN tru t ON t.id_a = c.id_a AND t.id_b = c.id_b
         |)""".stripMargin
    }.mkString(",\n")
    val rows = LshSweepBands.map { b =>
      s"""SELECT CAST($b AS BIGINT) AS bands,
         |  CAST(${DedupOps.NumPerm / b} AS BIGINT) AS rows_per_band,
         |  nc.n AS n_cand, nt.n AS n_true, tp.n AS tp,
         |  CASE WHEN nc.n > 0 THEN tp.n * $LshCardFp // nc.n ELSE 0 END AS precision_fp,
         |  CASE WHEN nt.n > 0 THEN tp.n * $LshCardFp // nt.n ELSE 0 END AS recall_fp
         |FROM nc_$b nc, tp_$b tp, nt""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${minhashSigCtes("documents")}, st AS MATERIALIZED (
       |  SELECT doc_id, unnest(sh) AS s FROM sh
       |), szx AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM sh
       |), interx AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS n_inter
       |  FROM st a JOIN st b ON b.s = a.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), tru AS MATERIALIZED (
       |  SELECT i.id_a, i.id_b
       |  FROM interx i
       |  JOIN szx sa ON sa.doc_id = i.id_a
       |  JOIN szx sb ON sb.doc_id = i.id_b
       |  WHERE 2 * i.n_inter >= sa.n + sb.n - i.n_inter
       |), nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tru),
       |$perConfig
       |SELECT * FROM (
       |$rows
       |) ORDER BY bands""".stripMargin
  }

  /** Per-JVM memo of the trained unigram model (the [[trainedMerges]]
    * convention: training is deterministic, q160/q161 share the
    * artifact). */
  private val unigramMemo = scala.collection.concurrent.TrieMap
    .empty[String, Unigram.Model]

  private def trainedUnigram(s: SparkSession, d: String): Unigram.Model =
    unigramMemo.getOrElseUpdate(new java.io.File(d).getCanonicalPath,
      Unigram.train(Bpe.wordHistogram(Tables.documents(s, d), "text")))

  /** Unigram-LM tokenizer encode (q160): the SentencePiece-family
    * counterpart to q90's BPE — frequency-seeded piece vocabulary,
    * ONE deterministic Viterbi-EM round, Q16 floored-log2 unigram
    * scores, maximum-likelihood segmentation. See [[Unigram]] for the
    * scale shape (distinct-word dictionary passes; model-sized
    * artifact). Output mirrors q90: (doc_id, n_words, n_pieces,
    * seg_md5) so the two tokenizer families gate identically. */
  def unigramEncode(s: SparkSession, d: String): DataFrame =
    Unigram.encodeDocs(Tables.documents(s, d), "doc_id", "text",
        trainedUnigram(s, d))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        md5(col("piece_text")).as("seg_md5"))
      .orderBy(col("doc_id"))

  /** Unigram vocabulary artifact (q161, the q104 convention): the
    * learned model itself on the oracle surface — seed counts, both
    * score generations, and EM usage per piece, so a seeding or
    * EM-round drift shows as the exact divergent piece. */
  def unigramVocab(s: SparkSession, d: String): DataFrame =
    Unigram.vocabTable(s, trainedUnigram(s, d)).orderBy(col("piece"))

  /** One DP round of the oracle's Viterbi chain: best (score, seg)
    * per word prefix of length `j` under score CTE `sc`, branches
    * k = 1..min(4, j), ties (score DESC, k ASC) — exactly
    * [[Unigram.viterbi]]'s strict-improvement-ascending-k order. */
  private def unigramDpCte(stage: Int, j: Int, scoreCte: String): String = {
    val branches = (1 to math.min(Unigram.MaxPiece, j)).map { k =>
      val st = j - k + 1
      s"""SELECT d.word, d.sc + s.sc AS sc,
         |  CASE WHEN d.seg = '' THEN substr(d.word, $st, $k)
         |       ELSE d.seg || ' ' || substr(d.word, $st, $k) END AS seg,
         |  $k AS k
         |FROM d${stage}_${j - k} d
         |JOIN $scoreCte s ON s.piece = substr(d.word, $st, $k)
         |WHERE length(d.word) >= $j""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""d${stage}_$j AS MATERIALIZED (
       |  SELECT word, sc, seg FROM (
       |    SELECT word, sc, seg,
       |      row_number() OVER (PARTITION BY word ORDER BY sc DESC, k) AS rn
       |    FROM (
       |$branches
       |    )
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  private def unigramFinCte(stage: Int): String = {
    val unions = (1 to Unigram.MaxWordLen)
      .map(j => s"SELECT word, seg FROM d${stage}_$j WHERE length(word) = $j")
      .mkString("\n    UNION ALL ")
    s"""fin$stage AS MATERIALIZED (
       |  SELECT h.word, h.cnt, d.seg FROM hist h JOIN (
       |    $unions
       |  ) d ON d.word = h.word
       |)""".stripMargin
  }

  /** The full unigram training-replay chain (hist → substring seed →
    * vocab → stage-0 scores → DP₁ → EM usage → stage-1 scores → DP₂
    * → enc), shared by the q160 and q161 oracles. */
  private def unigramCtes: String =
    s"""tok AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), w AS MATERIALIZED (
       |  SELECT doc_id, i, toks[i] AS word
       |  FROM tok, UNNEST(range(1, len(toks) + 1)) t(i)
       |), hist AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM w GROUP BY word
       |), $unigramCoreCtes""".stripMargin

  /** The unigram chain DOWNSTREAM of tok/w/hist (sub → … → uenc) —
    * splittable so the q163 comparison oracle can share one
    * tok/w/hist prefix between the BPE and unigram replays. */
  private def unigramCoreCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""sub AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS wt FROM (
       |    SELECT h.cnt, substr(h.word, st.st, ln.ln) AS piece
       |    FROM hist h,
       |      UNNEST(range(1, length(h.word) + 1)) st(st),
       |      UNNEST(range(1, ${Unigram.MaxPiece + 1})) ln(ln)
       |    WHERE st.st + ln.ln - 1 <= length(h.word)
       |  ) GROUP BY piece
       |), topv AS (
       |  SELECT piece FROM (
       |    SELECT piece, row_number() OVER (ORDER BY wt DESC, piece) AS rn
       |    FROM sub
       |  ) WHERE rn <= ${Unigram.SeedTopV}
       |), alpha AS (
       |  SELECT DISTINCT substr(word, i.i, 1) AS piece
       |  FROM hist, UNNEST(range(1, length(word) + 1)) i(i)
       |), vocab AS MATERIALIZED (
       |  SELECT piece FROM topv UNION SELECT piece FROM alpha
       |), c0 AS MATERIALIZED (
       |  SELECT v.piece, s.wt AS cnt0 FROM vocab v JOIN sub s ON s.piece = v.piece
       |), t0 AS (
       |  SELECT CAST(SUM(cnt0) AS BIGINT) AS t FROM c0
       |), av AS (
       |  SELECT DISTINCT v FROM (SELECT cnt0 AS v FROM c0 UNION SELECT t FROM t0)
       |), ${FixedLogSql.logCtes(prefix = "a")}, s0 AS MATERIALIZED (
       |  SELECT c.piece, la.lg - lt.lg AS sc
       |  FROM c0 c CROSS JOIN t0
       |  JOIN alog la ON la.v = c.cnt0
       |  JOIN alog lt ON lt.v = t0.t
       |), d1_0 AS (
       |  SELECT word, CAST(0 AS BIGINT) AS sc, '' AS seg FROM hist
       |)""".stripMargin
    for (j <- 1 to Unigram.MaxWordLen) sb ++= s",\n${unigramDpCte(1, j, "s0")}"
    sb ++= s",\n${unigramFinCte(1)}"
    sb ++= s""",
       | use1 AS (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u FROM (
       |    SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM fin1
       |  ) GROUP BY piece
       |), u1 AS MATERIALIZED (
       |  SELECT v.piece, CAST(COALESCE(u.u, 0) + 1 AS BIGINT) AS usage1
       |  FROM vocab v LEFT JOIN use1 u ON u.piece = v.piece
       |), t1 AS (
       |  SELECT CAST(SUM(usage1) AS BIGINT) AS t FROM u1
       |), bv AS (
       |  SELECT DISTINCT v FROM (SELECT usage1 AS v FROM u1 UNION SELECT t FROM t1)
       |), ${FixedLogSql.logCtes(prefix = "b")}, s1 AS MATERIALIZED (
       |  SELECT u.piece, lb.lg - lt.lg AS sc
       |  FROM u1 u CROSS JOIN t1
       |  JOIN blog lb ON lb.v = u.usage1
       |  JOIN blog lt ON lt.v = t1.t
       |), d2_0 AS (
       |  SELECT word, CAST(0 AS BIGINT) AS sc, '' AS seg FROM hist
       |)""".stripMargin
    for (j <- 1 to Unigram.MaxWordLen) sb ++= s",\n${unigramDpCte(2, j, "s1")}"
    sb ++= s",\n${unigramFinCte(2)}"
    sb ++= s""",
       | uenc AS MATERIALIZED (
       |  SELECT word, seg AS symstr,
       |    CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_syms
       |  FROM fin2
       |)""".stripMargin
    sb.result()
  }

  def unigramEncodeOracle: String =
    s"""WITH $unigramCtes
       |SELECT t.doc_id,
       |  CAST(COUNT(w.word) AS BIGINT) AS n_words,
       |  CAST(COALESCE(SUM(uenc.n_syms), 0) AS BIGINT) AS n_pieces,
       |  md5(COALESCE(string_agg(uenc.symstr, ' ' ORDER BY w.i), '')) AS seg_md5
       |FROM tok t
       |LEFT JOIN w ON w.doc_id = t.doc_id
       |LEFT JOIN uenc ON uenc.word = w.word
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  def unigramVocabOracle: String =
    s"""WITH $unigramCtes
       |SELECT c0.piece, c0.cnt0, s0.sc AS score0_q16, u1.usage1,
       |  s1.sc AS score1_q16
       |FROM c0 JOIN s0 ON s0.piece = c0.piece
       |JOIN u1 ON u1.piece = c0.piece
       |JOIN s1 ON s1.piece = c0.piece
       |ORDER BY 1""".stripMargin

  /** Pruned unigram vocabulary (q168): the third SentencePiece leg —
    * prune the q160 model to its top-${Unigram.PrunedTopV} pieces by
    * EM usage (alphabet kept), re-segment, re-score. Dropped pieces
    * force re-splits, so usage REDISTRIBUTES — the artifact is not a
    * row-filter of q161, which is exactly what the oracle's third
    * Viterbi replay certifies. */
  def unigramPrunedVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, rows) = Unigram.trainPruned(
      Bpe.wordHistogram(Tables.documents(s, d), "text"), trainedUnigram(s, d))
    rows.toDF("piece", "usage2", "score2_q16").orderBy(col("piece"))
  }

  def unigramPrunedVocabOracle: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH $unigramCtes, keep AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, row_number() OVER (ORDER BY usage1 DESC, piece) AS rn
       |    FROM u1
       |  ) WHERE rn <= ${Unigram.PrunedTopV}
       |  UNION SELECT piece FROM alpha
       |), s1k AS MATERIALIZED (
       |  SELECT s1.piece, s1.sc FROM s1 JOIN keep k ON k.piece = s1.piece
       |), d3_0 AS (
       |  SELECT word, CAST(0 AS BIGINT) AS sc, '' AS seg FROM hist
       |)""".stripMargin
    for (j <- 1 to Unigram.MaxWordLen) sb ++= s",\n${unigramDpCte(3, j, "s1k")}"
    sb ++= s",\n${unigramFinCte(3)}"
    sb ++= s""",
       | use2 AS (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u FROM (
       |    SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM fin3
       |  ) GROUP BY piece
       |), u2 AS MATERIALIZED (
       |  SELECT k.piece, CAST(COALESCE(u.u, 0) + 1 AS BIGINT) AS usage2
       |  FROM keep k LEFT JOIN use2 u ON u.piece = k.piece
       |), t2 AS (
       |  SELECT CAST(SUM(usage2) AS BIGINT) AS t FROM u2
       |), cv AS (
       |  SELECT DISTINCT v FROM (SELECT usage2 AS v FROM u2 UNION SELECT t FROM t2)
       |), ${FixedLogSql.logCtes(prefix = "c")}
       |SELECT u2.piece, u2.usage2, lc.lg - lt.lg AS score2_q16
       |FROM u2 CROSS JOIN t2
       |JOIN clog lc ON lc.v = u2.usage2
       |JOIN clog lt ON lt.v = t2.t
       |ORDER BY 1""".stripMargin
    sb.result()
  }

  /** Tokenizer comparison card (q163): BPE (q90's 24-merge model)
    * vs unigram-LM (q160's model) on the SAME corpus, per source —
    * the tokenizer-selection card a pipeline computes before
    * committing a vocabulary: fertility (pieces per word, ×2²⁰) and
    * compression (chars per piece, ×2²⁰) from exact integer counts.
    * Both encoders run their dictionary shape (distinct words encode
    * once, counts join the positional stream), so the card costs two
    * joins over word occurrences; the models come from the shared
    * memos. Oracle replays BOTH trainings in one statement — the q90
    * merge chain and the q160 Viterbi-EM chain share one tok/w/hist
    * prefix, so the two replays can never disagree on tokenization
    * input. */
  def tokenizerCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val src = docs.select(col("doc_id"), col("source"))
    val chars = docs.select(col("doc_id"),
        explode(filter(split(lower(col("text")), Tok.WS), t => t =!= ""))
          .as("word"))
      .join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(length(col("word"))).cast("long").as("n_chars"))
    def face(enc: DataFrame, piecesCol: String, name: String): DataFrame =
      enc.join(src, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_words")).as("n_words"),
          sum(col(piecesCol)).as("n_pieces"))
        .join(chars, Seq("source"))
        .select(lit(name).as("tokenizer"), col("source"), col("n_words"),
          col("n_pieces"), col("n_chars"),
          when(col("n_words") > 0,
            expr("(n_pieces * 1048576) div n_words")).otherwise(lit(0L))
            .as("fertility_fp"),
          when(col("n_pieces") > 0,
            expr("(n_chars * 1048576) div n_pieces")).otherwise(lit(0L))
            .as("chars_per_piece_fp"))
    val bpe = face(Bpe.encodeDocs(docs, "doc_id", "text",
      trainedMerges(s, d)), "n_bpe_tokens", "bpe")
    val uni = face(Unigram.encodeDocs(docs, "doc_id", "text",
      trainedUnigram(s, d)), "n_pieces", "unigram")
    bpe.unionByName(uni).orderBy(col("tokenizer"), col("source"))
  }

  def tokenizerCardOracle: String = {
    // bpeCtes provides tok/w/hist (+ the merge chain ending in enc);
    // the unigram core chain shares that prefix and ends in uenc
    val perDoc =
      s"""pdoc AS MATERIALIZED (
         |  SELECT w.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(SUM(length(w.word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(enc.n_syms) AS BIGINT) AS bpe_pieces,
         |    CAST(SUM(uenc.n_syms) AS BIGINT) AS uni_pieces
         |  FROM w
         |  JOIN enc ON enc.word = w.word
         |  JOIN uenc ON uenc.word = w.word
         |  GROUP BY 1
         |), bysrc AS MATERIALIZED (
         |  SELECT d.source,
         |    CAST(SUM(p.n_words) AS BIGINT) AS n_words,
         |    CAST(SUM(p.n_chars) AS BIGINT) AS n_chars,
         |    CAST(SUM(p.bpe_pieces) AS BIGINT) AS bpe_pieces,
         |    CAST(SUM(p.uni_pieces) AS BIGINT) AS uni_pieces
         |  FROM pdoc p JOIN documents d ON d.doc_id = p.doc_id
         |  GROUP BY 1
         |)""".stripMargin
    def row(name: String, pieces: String) =
      s"""SELECT '$name' AS tokenizer, source, n_words,
         |  $pieces AS n_pieces, n_chars,
         |  CASE WHEN n_words > 0 THEN ($pieces * 1048576) // n_words
         |    ELSE 0 END AS fertility_fp,
         |  CASE WHEN $pieces > 0 THEN (n_chars * 1048576) // $pieces
         |    ELSE 0 END AS chars_per_piece_fp
         |FROM bysrc""".stripMargin
    s"""WITH $bpeCtes, $unigramCoreCtes, $perDoc
       |SELECT * FROM (
       |${row("bpe", "bpe_pieces")}
       |UNION ALL
       |${row("unigram", "uni_pieces")}
       |) ORDER BY tokenizer, source""".stripMargin
  }

  /** Conversion funnel (q169): view → click → purchase per user, each
    * step's first occurrence strictly AFTER the previous step's (the
    * ordered-funnel semantics — a purchase before the click doesn't
    * count). Emits per step: users reaching it, conversion from the
    * previous step (×2²⁰), and the exact LOWER-MEDIAN microseconds
    * from the previous step (deterministic: the ⌈n/2⌉-th smallest
    * delta under a (delta, user) total order — the q85 exact-quantile
    * convention, no interpolation). Plan: three keyed min-aggregations
    * + user-keyed joins; medians are windows over the converter-sized
    * relation. The events-analytics face of the engine (sessionize
    * q45, retention q152, as-of q37 are siblings). */
  def funnelSteps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def firstAfter(tpe: String, prev: DataFrame, prevCol: String,
        outCol: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outCol))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .localCheckpoint(true)
    val t2 = firstAfter("click", t1, "t1", "t2").localCheckpoint(true)
    val t3 = firstAfter("purchase", t2, "t2", "t3").localCheckpoint(true)
    def medianUs(pairs: DataFrame, a: String, b: String): Long = {
      val deltas = pairs.select(col("user_id"),
        expr(s"timestampdiff(MICROSECOND, $a, $b)").as("dus"))
      val n = deltas.count()
      if (n == 0) 0L
      else deltas.orderBy(col("dus"), col("user_id"))
        .limit(((n + 1) / 2).toInt).orderBy(col("dus").desc, col("user_id"))
        .limit(1).head().getLong(1)
    }
    val (n1, n2, n3) = (t1.count(), t2.count(), t3.count())
    val m12 = medianUs(t2.join(t1, "user_id"), "t1", "t2")
    val m23 = medianUs(t3.join(t2, "user_id"), "t2", "t3")
    val fp = LshCardFp
    val rows = Seq(
      ("1_view", n1, fp, 0L),
      ("2_click", n2, if (n1 > 0) n2 * fp / n1 else 0L, m12),
      ("3_purchase", n3, if (n2 > 0) n3 * fp / n2 else 0L, m23))
    s.createDataFrame(rows)
      .toDF("step", "n_users", "conv_fp", "median_us_from_prev")
      .orderBy(col("step"))
  }

  def funnelStepsOracle: String =
    s"""WITH t1 AS MATERIALIZED (
       |  SELECT user_id, MIN(ts) AS t1 FROM events
       |  WHERE event_type = 'view' GROUP BY 1
       |), t2 AS MATERIALIZED (
       |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       |  JOIN t1 ON t1.user_id = e.user_id
       |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1
       |), t3 AS MATERIALIZED (
       |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       |  JOIN t2 ON t2.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1
       |), d12 AS (
       |  SELECT CAST(date_diff('microsecond', t1.t1, t2.t2) AS BIGINT) AS dus,
       |    t2.user_id,
       |    row_number() OVER (ORDER BY date_diff('microsecond', t1.t1, t2.t2), t2.user_id) AS rn,
       |    count(*) OVER () AS n
       |  FROM t2 JOIN t1 ON t1.user_id = t2.user_id
       |), d23 AS (
       |  SELECT CAST(date_diff('microsecond', t2.t2, t3.t3) AS BIGINT) AS dus,
       |    t3.user_id,
       |    row_number() OVER (ORDER BY date_diff('microsecond', t2.t2, t3.t3), t3.user_id) AS rn,
       |    count(*) OVER () AS n
       |  FROM t3 JOIN t2 ON t2.user_id = t3.user_id
       |), counts AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n1,
       |         (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n2,
       |         (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n3
       |), m12 AS (
       |  SELECT COALESCE((SELECT dus FROM d12 WHERE rn = (n + 1) // 2), 0) AS m
       |), m23 AS (
       |  SELECT COALESCE((SELECT dus FROM d23 WHERE rn = (n + 1) // 2), 0) AS m
       |)
       |SELECT step, n_users, conv_fp, median_us_from_prev FROM (
       |  SELECT '1_view' AS step, n1 AS n_users,
       |    CAST($LshCardFp AS BIGINT) AS conv_fp,
       |    CAST(0 AS BIGINT) AS median_us_from_prev FROM counts
       |  UNION ALL
       |  SELECT '2_click', n2,
       |    CASE WHEN n1 > 0 THEN n2 * $LshCardFp // n1 ELSE 0 END,
       |    (SELECT m FROM m12) FROM counts
       |  UNION ALL
       |  SELECT '3_purchase', n3,
       |    CASE WHEN n2 > 0 THEN n3 * $LshCardFp // n2 ELSE 0 END,
       |    (SELECT m FROM m23) FROM counts
       |) ORDER BY step""".stripMargin

  /** Session path analysis (q170): event-type TRANSITION counts
    * within the q45 sessions (gap 1800 s) — "after a view, what
    * happens next?", the next-step matrix product analytics builds on
    * sessionized streams. A transition is a consecutive event pair
    * inside one (user, session) under the (ts, event_id) total order;
    * emits every (from_type, to_type) with its count and the share of
    * the from-type's outgoing transitions (×2²⁰). One user-keyed
    * window (same partitioning the sessionizer already uses) + one
    * pair-keyed count; the share window runs on the 25-row type-pair
    * relation. */
  def sessionPaths(s: SparkSession, d: String): DataFrame = {
    val ev = Sessionize.sessionize(Tables.events(s, d), "user_id", "ts",
      "event_id", gapSeconds = 1800L)
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("from_total", sum(col("n")).over(wf))
      .withColumn("share_fp",
        expr(s"(n * $LshCardFp) div from_total"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("from_total"), col("share_fp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  def sessionPathsOracle: String =
    s"""WITH se AS MATERIALIZED (
       |  SELECT user_id, ts, event_id, event_type,
       |    CAST(SUM(is_new) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT user_id, ts, event_id, event_type,
       |      CASE WHEN lag(ts) OVER w IS NULL
       |        OR date_diff('second', lag(ts) OVER w, ts) > 1800
       |        THEN 1 ELSE 0 END AS is_new
       |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |  )
       |), pr AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id, session_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM se
       |), pc AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT from_type, to_type, n,
       |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
       |  (n * $LshCardFp) // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS share_fp
       |FROM pc ORDER BY from_type, to_type""".stripMargin

  /** Exact two-sample KS drift (q164): the bin-free companion to
    * q159 — sup-norm CDF gap over raw token lengths between the
    * even/odd slices, exact integers (see [[Drift.ksCard]]). */
  def ksDrift(s: SparkSession, d: String): DataFrame =
    Drift.ksCard(Tables.documents(s, d)).orderBy(col("n_tok"))

  def ksDriftOracle: String =
    s"""WITH tokc AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL THEN 0
       |      ELSE CAST(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS BIGINT) END AS n_tok
       |  FROM documents
       |), counts AS MATERIALIZED (
       |  SELECT n_tok,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r,
       |    CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM tokc GROUP BY 1
       |), cum AS (
       |  SELECT n_tok,
       |    CAST(SUM(r) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
       |    CAST(SUM(n) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_new,
       |    CAST(SUM(r) OVER () AS BIGINT) AS ref_n,
       |    CAST(SUM(n) OVER () AS BIGINT) AS new_n
       |  FROM counts
       |)
       |SELECT n_tok, cum_ref, cum_new, ref_n, new_n,
       |  abs(cum_ref * new_n - cum_new * ref_n) AS d_num,
       |  CAST(MAX(abs(cum_ref * new_n - cum_new * ref_n)) OVER () AS BIGINT) AS ks_num
       |FROM cum ORDER BY n_tok""".stripMargin

  /** PSI distribution-drift card (q159): exact-integer Population
    * Stability Index between the even-doc_id (reference) and
    * odd-doc_id (incoming) corpus slices along token-length bins and
    * language — see [[Drift.psiCard]] for the fixed-point form and
    * the bins-only log discipline. */
  def psiDrift(s: SparkSession, d: String): DataFrame =
    Drift.psiCard(Tables.documents(s, d))
      .orderBy(col("axis"), col("bin"))

  /** The PSI card math downstream of a `card0(axis, bin, ref_cnt,
    * new_cnt)` CTE — add-1 smoothing, one [[FixedLogSql]] chain over
    * the distinct smoothed products, the same window sums — shared by
    * the q159 (token) and q165 (embedding) oracles so the two drift
    * replays cannot diverge in the statistic itself. */
  private def psiMathSql: String =
    s"""tot AS (
       |  SELECT axis,
       |    CAST(SUM(ref_cnt) + COUNT(*) AS BIGINT) AS ref_tot1,
       |    CAST(SUM(new_cnt) + COUNT(*) AS BIGINT) AS new_tot1
       |  FROM card0 GROUP BY 1
       |), args AS MATERIALIZED (
       |  SELECT c.axis, c.bin, c.ref_cnt, c.new_cnt, t.ref_tot1, t.new_tot1,
       |    (c.ref_cnt + 1) * t.new_tot1 AS xa,
       |    (c.new_cnt + 1) * t.ref_tot1 AS xb
       |  FROM card0 c JOIN tot t ON t.axis = c.axis
       |), lv AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT xa AS v FROM args UNION SELECT xb FROM args)
       |), ${FixedLogSql.logCtes()}, terms AS (
       |  SELECT a.axis, a.bin, a.ref_cnt, a.new_cnt, a.ref_tot1, a.new_tot1,
       |    la.lg - lb.lg AS dlog_q16,
       |    (a.xa - a.xb) * (la.lg - lb.lg) AS term_num
       |  FROM args a
       |  JOIN llog la ON la.v = a.xa
       |  JOIN llog lb ON lb.v = a.xb
       |)
       |SELECT axis, bin, ref_cnt, new_cnt, ref_tot1, new_tot1, dlog_q16,
       |  term_num,
       |  CAST(SUM(term_num) OVER (PARTITION BY axis) AS BIGINT) AS psi_num
       |FROM terms ORDER BY axis, bin""".stripMargin

  def psiDriftOracle: String =
    s"""WITH tokc AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL THEN 0
       |      ELSE CAST(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS BIGINT) END AS n_tok,
       |    COALESCE(lang, '??') AS lang
       |  FROM documents
       |), card0 AS MATERIALIZED (
       |  SELECT axis, bin,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
       |    CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_cnt
       |  FROM (
       |    SELECT doc_id, 'len' AS axis, printf('%02d', least(n_tok // 16, 15)) AS bin FROM tokc
       |    UNION ALL
       |    SELECT doc_id, 'lang', lang FROM tokc
       |  ) GROUP BY 1, 2
       |), $psiMathSql""".stripMargin

  /** Embedding-space drift (q165): the PSI card over the embeddings
    * table (first-component grid + label mix) — see
    * [[Drift.embPsiCard]]; the representation-drift gate token-level
    * q159 can't provide. */
  def embDrift(s: SparkSession, d: String): DataFrame =
    Drift.embPsiCard(Tables.embeddings(s, d))
      .orderBy(col("axis"), col("bin"))

  def embDriftOracle: String =
    s"""WITH es AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 16) AS BIGINT) + 8 AS raw,
       |    CAST(label AS BIGINT) AS lab
       |  FROM embeddings
       |), card0 AS MATERIALIZED (
       |  SELECT axis, bin,
       |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
       |    CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_cnt
       |  FROM (
       |    SELECT vec_id, 'emb_c0' AS axis,
       |      printf('%02d', greatest(0, least(15, raw))) AS bin FROM es
       |    UNION ALL
       |    SELECT vec_id, 'label', printf('%02d', lab) FROM es
       |  ) GROUP BY 1, 2
       |), $psiMathSql""".stripMargin

  /** Incremental exact similarity join (q162): the odd-doc_id batch
    * against the even-doc_id indexed corpus (the q138 split
    * convention) — see [[DedupOps.ppjoinIncremental]] for the
    * frozen-order correctness argument. The oracle is the ONE-SHOT
    * q157 exact chain filtered to batch-involved pairs, so the hash
    * compare IS the proof that the incremental path (stale df order,
    * df-0 unseen shingles, batch-sized work) finds exactly the pairs
    * a full recompute would. */
  def ppjoinIncrementalQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    DedupOps.ppjoinIncremental(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0))
      .orderBy(col("id_a"), col("id_b"))
  }

  def ppjoinIncrementalOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), shl AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
       |  FROM tok WHERE len(toks) > 0
       |), st AS MATERIALIZED (
       |  SELECT doc_id, unnest(sh) AS s FROM shl
       |), sz AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shl
       |), inter AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS n_inter
       |  FROM st a JOIN st b ON b.s = a.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT i.id_a, i.id_b, i.n_inter,
       |  sa.n + sb.n - i.n_inter AS n_union
       |FROM inter i
       |JOIN sz sa ON sa.doc_id = i.id_a
       |JOIN sz sb ON sb.doc_id = i.id_b
       |WHERE 2 * i.n_inter >= sa.n + sb.n - i.n_inter
       |  AND (i.id_a % 2 <> 0 OR i.id_b % 2 <> 0)
       |ORDER BY id_a, id_b""".stripMargin

  // ─────────────────────────────────────────────────────────── q209 ──

  /** q209 gate thresholds: 0.1 nats PSI in Q16 log2 units
    * (0.1/ln2·2¹⁶ ≈ 9455.5 — the shared INTEGER constant, so both
    * engines decide identically even on the knife edge) and KS
    * D ≥ 0.1 as the cross-multiplied 10·ks_num ≥ R·N. */
  private val DriftPsiTq16 = 9455L

  /** Drift gate → mix re-apportionment (q209): the capstone that
    * WIRES the drift cards to an ingestion ACTION — the q200 pattern
    * applied to the training-data funnel. All three drift statistics
    * run over the standard even/odd slice pair: token PSI (q159,
    * axes len/lang), exact KS on raw token lengths (q164), and
    * embedding-space PSI (q165, axes emb_c0/label). Each gate is an
    * EXACT integer comparison (psi_num ≥ 9455·R1·N1; 10·ks_num ≥
    * R·N — no float ever decides), and if ANY fires the q86 curated
    * mix re-apportions: the per-source train token budget halves
    * (2000 → 1000 chars), quarantining volume until the drift is
    * triaged — the conservative production response (never silently
    * train MORE on a shifted distribution). Emits a (k, v) card:
    * per-metric num/den/fired rows, the any-fired verdict, the
    * chosen budget, and the resulting per-source train mix
    * (docs + chars actually admitted under the gated budget).
    *
    * Headroom ENFORCED: slice totals < 2²⁴ (PSI) and < 2²⁹ (KS)
    * keep every cross-product comparison inside a Long/BIGINT —
    * beyond that, compute the cards on a bounded sample per slice
    * (both statistics are scale-free; the [[Drift]] scaladoc's
    * planet-scale note).
    *
    * Shape at scale: the three cards are the q159/q164/q165 passes
    * (bin-keyed partial aggregations; logs on bin-sized relations
    * only); the gate reads MODEL-sized collects (≤ axes rows); the
    * mix is the q86 chain with the budget as a driver constant. */
  def driftGateCard(docs: DataFrame, emb: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    def psiGates(card: DataFrame): Seq[(String, Long)] = {
      val rows = card.groupBy(col("axis"))
        .agg(max(col("psi_num")).as("p"), max(col("ref_tot1")).as("r"),
          max(col("new_tot1")).as("n"))
        .collect()
      rows.toSeq.flatMap { r =>
        val axis = r.getString(0)
        val (p, rt, nt) = (r.getLong(1), r.getLong(2), r.getLong(3))
        require(rt < (1L << 24) && nt < (1L << 24),
          s"driftGate PSI headroom: slice totals $rt/$nt >= 2^24 would " +
            "wrap the threshold product - sample the slices (PSI is " +
            "scale-free)")
        val den = rt * nt
        Seq(s"gate_psi_${axis}_num" -> p, s"gate_psi_${axis}_den" -> den,
          s"gate_psi_${axis}_fired" ->
            (if (p >= DriftPsiTq16 * den) 1L else 0L))
      }
    }
    // empty docs → ksCard is an empty relation → the max() row is all
    // NULL; treat it as 0/0/not-fired (the oracle's NULL comparisons
    // leave the gate unfired the same way) instead of NPEing
    val ksRow = Drift.ksCard(docs)
      .agg(max(col("ks_num")), max(col("ref_n")), max(col("new_n"))).head()
    val (ksN, ksR, ksM) =
      if (ksRow.isNullAt(0)) (0L, 0L, 0L)
      else (ksRow.getLong(0), ksRow.getLong(1), ksRow.getLong(2))
    require(ksR < (1L << 29) && ksM < (1L << 29),
      s"driftGate KS headroom: slice sizes $ksR/$ksM >= 2^29 would wrap " +
        "the cross-multiply - sample the slices")
    val gates = psiGates(Drift.psiCard(docs)) ++
      psiGates(Drift.embPsiCard(emb)) ++
      Seq("gate_ks_len_num" -> ksN, "gate_ks_len_den" -> (ksR * ksM),
        "gate_ks_len_fired" ->
          (if (ksR * ksM > 0L && 10L * ksN >= ksR * ksM) 1L else 0L))
    val anyFired = gates.exists { case (k, v) =>
      k.endsWith("_fired") && v == 1L
    }
    val budget = if (anyFired) 1000L else 2000L
    val gateRows = gates ++ Seq(
      "gate_any_fired" -> (if (anyFired) 1L else 0L),
      "mix_budget" -> budget)
    val curated = Curation.curate(docs, md5Based = true)
    val withSplit = Sampling.assignSplit(curated, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0), salt = "split")
    val train = Packing.tokenBudgetSample(
      withSplit.filter(col("split") === "train"), "source", "doc_id",
      "n_chars", Map.empty, defaultBudget = budget, salt = "tb")
    val perSrc = train.groupBy(col("source"))
      .agg(count(lit(1)).as("nd"), sum(col("n_chars")).as("nc"))
      .localCheckpoint(true) // two projections read it
    val mix = perSrc
      .select(concat(lit("mix_train_docs_"), col("source")).as("k"),
        col("nd").as("v"))
      .unionByName(perSrc
        .select(concat(lit("mix_train_chars_"), col("source")).as("k"),
          col("nc").as("v")))
    gateRows.toDF("k", "v").unionByName(mix).orderBy(col("k"))
  }

  def driftGate(s: SparkSession, d: String): DataFrame =
    driftGateCard(Tables.documents(s, d), Tables.embeddings(s, d))

  /** Per-axis PSI sums for the q209 oracle: (axis, psi_num, ref_tot1,
    * new_tot1) from a `card0` named `$card`, CTE names prefixed `$p`
    * so the token and embedding chains coexist in one query (the
    * [[FixedLogSql.logCtes]] prefix convention). */
  private def psiGateSql(card: String, p: String): String =
    s"""${p}tot AS (
       |  SELECT axis,
       |    CAST(SUM(ref_cnt) + COUNT(*) AS BIGINT) AS ref_tot1,
       |    CAST(SUM(new_cnt) + COUNT(*) AS BIGINT) AS new_tot1
       |  FROM $card GROUP BY 1
       |), ${p}args AS MATERIALIZED (
       |  SELECT c.axis, t.ref_tot1, t.new_tot1,
       |    (c.ref_cnt + 1) * t.new_tot1 AS xa,
       |    (c.new_cnt + 1) * t.ref_tot1 AS xb
       |  FROM $card c JOIN ${p}tot t ON t.axis = c.axis
       |), ${p}v AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT xa AS v FROM ${p}args UNION SELECT xb FROM ${p}args)
       |), ${FixedLogSql.logCtes(16, p)}, ${p}psi AS (
       |  SELECT a.axis,
       |    CAST(SUM((a.xa - a.xb) * (la.lg - lb.lg)) AS BIGINT) AS psi_num,
       |    CAST(MAX(a.ref_tot1) AS BIGINT) AS ref_tot1,
       |    CAST(MAX(a.new_tot1) AS BIGINT) AS new_tot1
       |  FROM ${p}args a
       |  JOIN ${p}log la ON la.v = a.xa
       |  JOIN ${p}log lb ON lb.v = a.xb
       |  GROUP BY 1
       |)""".stripMargin

  def driftGateOracle: String =
    s"""WITH tokc AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL THEN 0
       |      ELSE CAST(len(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS BIGINT) END AS n_tok,
       |    COALESCE(lang, '??') AS lang
       |  FROM documents
       |), pcard AS MATERIALIZED (
       |  SELECT axis, bin,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
       |    CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_cnt
       |  FROM (
       |    SELECT doc_id, 'len' AS axis, printf('%02d', least(n_tok // 16, 15)) AS bin FROM tokc
       |    UNION ALL
       |    SELECT doc_id, 'lang', lang FROM tokc
       |  ) GROUP BY 1, 2
       |), ${psiGateSql("pcard", "p")}, es AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 16) AS BIGINT) + 8 AS raw,
       |    CAST(label AS BIGINT) AS lab
       |  FROM embeddings
       |), ecard AS MATERIALIZED (
       |  SELECT axis, bin,
       |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
       |    CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_cnt
       |  FROM (
       |    SELECT vec_id, 'emb_c0' AS axis,
       |      printf('%02d', greatest(0, least(15, raw))) AS bin FROM es
       |    UNION ALL
       |    SELECT vec_id, 'label', printf('%02d', lab) FROM es
       |  ) GROUP BY 1, 2
       |), ${psiGateSql("ecard", "e")}, kcnt AS MATERIALIZED (
       |  SELECT n_tok,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r,
       |    CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM tokc GROUP BY 1
       |), ksq AS (
       |  SELECT
       |    CAST(MAX(abs(cum_ref * new_n - cum_new * ref_n)) AS BIGINT) AS ks_num,
       |    CAST(MAX(ref_n) AS BIGINT) AS ref_n,
       |    CAST(MAX(new_n) AS BIGINT) AS new_n
       |  FROM (
       |    SELECT
       |      CAST(SUM(r) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
       |      CAST(SUM(n) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_new,
       |      CAST(SUM(r) OVER () AS BIGINT) AS ref_n,
       |      CAST(SUM(n) OVER () AS BIGINT) AS new_n
       |    FROM kcnt
       |  )
       |), gate AS (
       |  SELECT CASE WHEN
       |      EXISTS (SELECT 1 FROM ppsi
       |        WHERE psi_num >= $DriftPsiTq16 * ref_tot1 * new_tot1)
       |      OR EXISTS (SELECT 1 FROM epsi
       |        WHERE psi_num >= $DriftPsiTq16 * ref_tot1 * new_tot1)
       |      OR EXISTS (SELECT 1 FROM ksq
       |        WHERE 10 * ks_num >= ref_n * new_n)
       |    THEN 1 ELSE 0 END AS fired
       |), bud AS (
       |  SELECT CASE WHEN fired = 1 THEN 1000 ELSE 2000 END AS b FROM gate
       |), $curationCtes, sp AS (
       |  SELECT doc_id, source, n_chars,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
       |           < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)
       |           < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM samp
       |), tr AS (
       |  SELECT doc_id, source, n_chars,
       |    SUM(n_chars) OVER (PARTITION BY source
       |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || 'tb'), 1, 8), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM sp WHERE split = 'train' AND n_chars IS NOT NULL
       |), trk AS (
       |  SELECT source, doc_id, n_chars FROM tr
       |  WHERE cum <= (SELECT b FROM bud)
       |)
       |SELECT k, v FROM (
       |  SELECT 'gate_psi_' || axis || '_num' AS k, psi_num AS v FROM ppsi
       |  UNION ALL SELECT 'gate_psi_' || axis || '_den',
       |    ref_tot1 * new_tot1 FROM ppsi
       |  UNION ALL SELECT 'gate_psi_' || axis || '_fired',
       |    CASE WHEN psi_num >= $DriftPsiTq16 * ref_tot1 * new_tot1
       |      THEN 1 ELSE 0 END FROM ppsi
       |  UNION ALL SELECT 'gate_psi_' || axis || '_num', psi_num FROM epsi
       |  UNION ALL SELECT 'gate_psi_' || axis || '_den',
       |    ref_tot1 * new_tot1 FROM epsi
       |  UNION ALL SELECT 'gate_psi_' || axis || '_fired',
       |    CASE WHEN psi_num >= $DriftPsiTq16 * ref_tot1 * new_tot1
       |      THEN 1 ELSE 0 END FROM epsi
       |  UNION ALL SELECT 'gate_ks_len_num', ks_num FROM ksq
       |  UNION ALL SELECT 'gate_ks_len_den', ref_n * new_n FROM ksq
       |  UNION ALL SELECT 'gate_ks_len_fired',
       |    CASE WHEN 10 * ks_num >= ref_n * new_n THEN 1 ELSE 0 END FROM ksq
       |  UNION ALL SELECT 'gate_any_fired', fired FROM gate
       |  UNION ALL SELECT 'mix_budget', b FROM bud
       |  UNION ALL SELECT 'mix_train_docs_' || source,
       |    CAST(count(*) AS BIGINT) FROM trk GROUP BY source
       |  UNION ALL SELECT 'mix_train_chars_' || source,
       |    CAST(SUM(n_chars) AS BIGINT) FROM trk GROUP BY source
       |) ORDER BY k""".stripMargin

  def ppjoinOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
       |  FROM documents
       |), shl AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
       |  FROM tok WHERE len(toks) > 0
       |), st AS MATERIALIZED (
       |  SELECT doc_id, unnest(sh) AS s FROM shl
       |), sz AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shl
       |), inter AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS n_inter
       |  FROM st a JOIN st b ON b.s = a.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT i.id_a, i.id_b, i.n_inter,
       |  sa.n + sb.n - i.n_inter AS n_union
       |FROM inter i
       |JOIN sz sa ON sa.doc_id = i.id_a
       |JOIN sz sb ON sb.doc_id = i.id_b
       |WHERE 2 * i.n_inter >= sa.n + sb.n - i.n_inter
       |ORDER BY id_a, id_b""".stripMargin
}
