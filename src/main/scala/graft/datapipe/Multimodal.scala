package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample as batched partition-level
  * transforms (the Scala analog of `mapInPandas` — one buffer per
  * batch, amortized init, vectorizable shape).
  *
  * IMAGES decode for real: PNG/JPEG/BMP/GIF through the JDK's own
  * `javax.imageio` ([[decodeImage]] — metadata + a luminance-byte
  * payload; [[resize]] re-renders pixels). AUDIO decodes for real for
  * WAV/AIFF/AU: `javax.sound.sampled` ships in the base JDK
  * ([[decodeAudio]] — metadata + an 8-bit-unsigned sample payload).
  * VIDEO stays stubbed ([[decodeStub]], a deterministic fake
  * container) because no video codec ships in the JDK; [[decode]]
  * dispatches on the container magic, so a real codec binding drops
  * in by extending one function.
  */
object Multimodal {

  // javax.imageio defaults to a DISK-backed stream cache: every
  // ImageIO.write / createImageInputStream call creates (and deletes) a
  // temp FILE, so per-row codec work pays two filesystem round-trips per
  // image — measured as the dominant, host-dependent cost of q92 (9.6 s
  // vs 1.6 s across hosts at sf0.1). All our streams are in-memory byte
  // arrays; the memory cache is strictly faster and bit-identical.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(
      modality: String, // "image" | "audio" | "video"
      format: String,
      width: Int,
      height: Int,
      nFrames: Int,
      sampleRate: Int)

  final case class MediaRow(media_id: Long, data: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      checksum: Long,
      // stub "decoded" features: deterministic projection of the bytes
      mean_intensity: Double,
      feature_vec: Array[Float])

  /** Fake header layout (deterministic test media): 16 bytes —
    * [magic u8, modality u8, format u8, pad u8, width i16, height i16,
    *  nFrames i16, sampleRate i32, pad i16] followed by payload. */
  def encodeFake(modality: String, width: Int, height: Int, nFrames: Int,
      sampleRate: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.put(0x7f.toByte)
    bb.put((modality match { case "image" => 1; case "audio" => 2; case _ => 3 }).toByte)
    bb.put(1.toByte).put(0.toByte)
    bb.putShort(width.toShort).putShort(height.toShort).putShort(nFrames.toShort)
    bb.putInt(sampleRate).putShort(0)
    bb.put(payload)
    bb.array()
  }

  /** STUB decoder — replace with a real codec binding in production.
    * Deterministic: metadata from the fake header, "intensity" from the
    * payload bytes. */
  def decodeStub(data: Array[Byte]): Option[(MediaMeta, Array[Byte])] = {
    if (data == null || data.length < 16 || data(0) != 0x7f.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(data)
    bb.get()
    val modality = bb.get() match { case 1 => "image"; case 2 => "audio"; case _ => "video" }
    bb.get(); bb.get()
    val w = bb.getShort.toInt
    val h = bb.getShort.toInt
    val f = bb.getShort.toInt
    val sr = bb.getInt
    bb.getShort
    val payload = java.util.Arrays.copyOfRange(data, 16, data.length)
    Some((MediaMeta(modality, "fake", w, h, f, sr), payload))
  }

  /** Real image decode via the JDK's `javax.imageio` (PNG, JPEG, BMP,
    * GIF readers ship in the base JDK — no external libraries).
    * Returns typed metadata plus a row-major luminance payload (one
    * byte per pixel, integer ITU-R BT.601 weights — deterministic, no
    * float rounding), the same (meta, payload) shape the stub emits so
    * every downstream stage is codec-agnostic. Undecodable bytes →
    * None (same contract as the stub: corrupt rows drop, never throw). */
  def decodeImage(data: Array[Byte]): Option[(MediaMeta, Array[Byte])] = {
    if (data == null || data.length < 4) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(data))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val fmt = reader.getFormatName.toLowerCase
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val payload = new Array[Byte](w * h)
        var i = 0
        while (i < payload.length) {
          val p = rgb(i)
          payload(i) = ((((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
            (p & 0xff) * 114) / 1000).toByte
          i += 1
        }
        Some((MediaMeta("image", fmt, w, h, 1, 0), payload))
      } finally reader.dispose()
    } catch { case _: Exception => None }
    finally if (iis != null) iis.close()
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV, AIFF,
    * AU readers ship in the base JDK). The stream is converted to
    * 16-bit signed PCM, then each sample is projected to its unsigned
    * high byte ((s >> 8) + 128) — one byte per sample, channels
    * interleaved — the audio analog of [[decodeImage]]'s luminance
    * payload: deterministic, integer-exact, codec-agnostic downstream.
    * Meta: width := channel count (audio has no pixel dims), nFrames =
    * per-channel frame count, sampleRate from the header. Undecodable
    * bytes → None (corrupt rows drop, never throw). */
  def decodeAudio(data: Array[Byte]): Option[(MediaMeta, Array[Byte])] = {
    if (data == null || data.length < 12) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val fmt = ais.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
          fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
        val raw = pcm.readAllBytes()
        val nSamples = raw.length / 2
        val payload = new Array[Byte](nSamples)
        var i = 0
        while (i < nSamples) {
          // little-endian signed 16-bit sample -> unsigned high byte
          val s = (raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)
          payload(i) = (((s >> 8) + 128) & 0xff).toByte
          i += 1
        }
        Some((MediaMeta("audio", "wav", fmt.getChannels, 0,
          nSamples / fmt.getChannels, fmt.getSampleRate.toInt), payload))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Decode dispatch: the deterministic fake container (magic 0x7f —
    * no real format starts with it) parses via [[decodeStub]]; RIFF
    * ("RIFF" magic), AIFF ("FORM") and AU (".snd") containers try the
    * real audio path ([[decodeAudio]]) first, then fall back to the
    * real image path — RIFF is also an image container family (WebP),
    * so an audio-parse failure must not drop a payload an installed
    * `ImageIO` plugin could read; any other bytes go straight to
    * [[decodeImage]]. Only video remains stubbed. */
  def decode(data: Array[Byte]): Option[(MediaMeta, Array[Byte])] =
    if (data != null && data.length >= 16 && data(0) == 0x7f.toByte)
      decodeStub(data)
    else if (data != null && data.length >= 12 && (
        (data(0) == 'R' && data(1) == 'I' && data(2) == 'F' && data(3) == 'F') ||
        (data(0) == 'F' && data(1) == 'O' && data(2) == 'R' && data(3) == 'M') ||
        (data(0) == '.' && data(1) == 's' && data(2) == 'n' && data(3) == 'd')))
      decodeAudio(data).orElse(decodeImage(data))
    else decodeImage(data)

  /** Deterministic 16-bit mono PCM sample for (id, i): engine-portable
    * arithmetic (no overflow in the composed range), so an SQL oracle
    * can recompute the decoded stats without parsing WAV bytes. */
  def synthSample(id: Long, i: Long): Int =
    (((id * 7 + i * 37) % 65536) - 32768).toInt

  /** Real-WAV media table: one RIFF/PCM file per document, samples
    * from [[synthSample]], container written by `javax.sound.sampled`
    * itself. Decoding these rows exercises the REAL audio path
    * end-to-end while the expected per-file sample statistics remain
    * recomputable in SQL (q74's oracle). */
  def synthWavTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = (200 + id % 100).toInt
      val raw = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = synthSample(id, i)
        raw(2 * i) = (s & 0xff).toByte
        raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRow(id, bos.toByteArray, MediaMeta("audio", "wav", 1, 0, n, 8000))
    }
  }

  /** Build a deterministic fake media table derived from the documents
    * table (binary payload = the text bytes; modality round-robins). */
  def fakeMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val modality = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val payload = text.getBytes("UTF-8")
      val data = encodeFake(modality, 64 + (id % 64).toInt, 64, 1 + (id % 30).toInt,
        16000, payload)
      MediaRow(id, data, MediaMeta(modality, "fake", 64 + (id % 64).toInt, 64,
        1 + (id % 30).toInt, 16000))
    }
  }

  /** Batched feature extraction: decode + project features, processed
    * per-partition with a reusable buffer (mapInPandas batch shape). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      featureDim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (the start_bundle/one-time-model-load slot)
      val featBuf = new Array[Float](featureDim)
      rows.flatMap { r =>
        decode(r.data).map { case (meta, payload) =>
          var sum = 0L
          var checksum = 0xcbf29ce484222325L
          java.util.Arrays.fill(featBuf, 0.0f)
          var i = 0
          while (i < payload.length) {
            val b = payload(i) & 0xff
            sum += b
            checksum = (checksum ^ b) * 0x100000001b3L
            featBuf(i % featureDim) += b / 255.0f
            i += 1
          }
          MediaFeatures(r.media_id, meta.modality, r.data.length.toLong, checksum,
            if (payload.isEmpty) 0.0 else sum.toDouble / payload.length,
            featBuf.clone())
        }
      }
    }
  }

  /** Integer-exact per-media stats through the full decode path
    * (header parse → payload scan): engine-portable — byte sums are
    * emitted as integers, so the DuckDB oracle can recompute them from
    * the deterministic fake encoding (q52). */
  def mediaStats(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decode(r.data).map { case (meta, payload) =>
          var sum = 0L
          var i = 0
          while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
          (r.media_id, meta.modality, r.data.length.toLong, sum, payload.length.toLong)
        }
      }
    }.toDF("media_id", "modality", "n_bytes", "sum_bytes", "n_payload")
  }

  /** REAL full-resolution sample decode: the 16-bit twin of
    * [[decodeAudio]] (which emits the 8-bit high-byte payload) —
    * same `javax.sound.sampled` path, same PCM_SIGNED/16-bit/LE
    * target format, but the signed samples themselves. For PCM input
    * at the target format the conversion is a bit-exact passthrough,
    * which is what lets q140's oracle recompute features from the
    * synthesis arithmetic without parsing a byte. */
  def decodeAudioSamples(data: Array[Byte]): Option[Array[Int]] = {
    if (data == null || data.length < 12) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val fmt = ais.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
          fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
        val raw = pcm.readAllBytes()
        val out = new Array[Int](raw.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = (raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)
          i += 1
        }
        Some(out)
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Windowed audio FEATURE EXTRACTION over really-decoded samples —
    * the "feature-extract" stage of a multimodal curation pipeline,
    * emitting the exact integer per-frame features an audio-quality
    * gate thresholds on: per `frameLen`-sample frame (trailing
    * partial frame included, `n_in_frame` says) the sample sum,
    * min, max, and the zero-crossing count (sign convention:
    * negative vs non-negative; only within-frame adjacent pairs
    * count, so frames are independently recomputable). One batched
    * mapPartitions pass, per-row work ∝ payload — the decode stage
    * shape, no shuffle. */
  def audioFrameFeatures(spark: SparkSession, media: Dataset[MediaRow],
      frameLen: Int = 64): DataFrame = {
    require(frameLen >= 2, s"frameLen too small: $frameLen")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudioSamples(r.data).iterator.flatMap { s =>
          (0 until s.length by frameLen).iterator.map { st =>
            val en = math.min(st + frameLen, s.length)
            var sum = 0L
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var zc = 0L
            var i = st
            while (i < en) {
              val v = s(i)
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              if (i > st && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
              i += 1
            }
            (r.media_id, (st / frameLen).toLong, (en - st).toLong,
              sum, mn.toLong, mx.toLong, zc)
          }
        }
      }
    }.toDF("media_id", "frame_id", "n_in_frame", "sum_s", "min_s",
      "max_s", "n_zc")
  }

  /** Fixed-point trig table for [[audioSpectralFeatures]]: phase
    * j ∈ 0..63 → (⌊cos(2πj/64)·2¹⁵⌉, ⌊sin(2πj/64)·2¹⁵⌉). The SINGLE
    * source of truth for both engines — the Scala executor loop reads
    * this array and the q142 oracle embeds the SAME integers as a
    * VALUES literal table (the q109 shared-literal convention), so
    * there is no cross-engine trig or rounding to disagree on. */
  val SpectralFp: Long = 1L << 15
  val SpectralPhases: Int = 64
  lazy val trigTable: Array[(Int, Long, Long)] =
    Array.tabulate(SpectralPhases) { j =>
      val th = 2.0 * math.Pi * j / SpectralPhases
      (j, math.round(math.cos(th) * SpectralFp),
        math.round(math.sin(th) * SpectralFp))
    }

  /** The analysis bins (cycles per 64-sample frame): one low, two
    * mid, one high — the fixed comb an audio-quality gate thresholds
    * (e.g. hum at a low bin, hiss at a high one). */
  val SpectralBins: Array[Int] = Array(1, 3, 7, 15)

  /** SPECTRAL feature extraction (q142): exact integer DFT bin
    * energies per frame — the frequency-domain companion of
    * [[audioFrameFeatures]]'s time-domain stats. Per frame and bin k:
    *
    *   re = Σ_j x_j·cosT[(k·j) mod 64], im = Σ_j x_j·sinT[(k·j) mod 64]
    *   energy = (re² + im²) // 2¹⁵
    *
    * with cosT/sinT the [[trigTable]] integers — every operation is
    * integer multiply/add plus one truncating division, so the q142
    * oracle recomputes all three from the synthesis arithmetic and
    * the same literal table, bit-for-bit (re/im ≤ 64·2¹⁵·2¹⁵ = 2³⁶
    * fit a BIGINT; the squares are formed in 128-bit both sides).
    * Trailing partial frames use local sample index j — frames are
    * independently recomputable (frame-local, property-pinned). Same
    * scale shape as q140: one batched mapPartitions decode pass,
    * per-row work ∝ payload × bins, no shuffle before the
    * presentation sort. */
  def audioSpectralFeatures(spark: SparkSession, media: Dataset[MediaRow],
      frameLen: Int = 64): DataFrame = {
    require(frameLen >= 2, s"frameLen too small: $frameLen")
    import spark.implicits._
    val cosT = trigTable.map(_._2)
    val sinT = trigTable.map(_._3)
    val bins = SpectralBins
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudioSamples(r.data).iterator.flatMap { s =>
          (0 until s.length by frameLen).iterator.flatMap { st =>
            val en = math.min(st + frameLen, s.length)
            bins.iterator.map { k =>
              var re = 0L
              var im = 0L
              var i = st
              while (i < en) {
                val ph = (k * (i - st)) % SpectralPhases
                re += s(i) * cosT(ph)
                im += s(i) * sinT(ph)
                i += 1
              }
              val energy = ((BigInt(re) * re + BigInt(im) * im) /
                BigInt(SpectralFp)).toLong
              (r.media_id, (st / frameLen).toLong, k, re, im, energy)
            }
          }
        }
      }
    }.toDF("media_id", "frame_id", "bin", "re_fp", "im_fp", "energy_fp")
  }

  /** Frame sampling for video rows: every `stride`-th frame index
    * (plumbing only — frames are index markers over the stub). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.modality == "video")
      .map(r => (r.media_id, (0 until r.meta.nFrames by stride).toArray))
      .toDF("media_id", "sampled_frames")
  }

  /** Scale real image bytes to (w, h): bilinear re-render through
    * `java.awt` (headless-safe) and re-encode as PNG. None when the
    * bytes aren't a decodable image. */
  def resizeImageBytes(data: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      catch { case _: Exception => null }
    if (img == null) return None
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some(bos.toByteArray)
  }

  /** Resize: real images re-render their pixels (PNG out); fake
    * containers rewrite the header only (their payload is opaque).
    * Rows that decode as neither pass through unchanged. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.data != null && r.data.length >= 16 && r.data(0) == 0x7f.toByte)
        decodeStub(r.data) match {
          case Some((meta, payload)) =>
            r.copy(
              data = encodeFake(meta.modality, w, h, meta.nFrames, meta.sampleRate, payload),
              meta = meta.copy(width = w, height = h))
          case None => r
        }
      else
        resizeImageBytes(r.data, w, h) match {
          case Some(png) =>
            r.copy(data = png,
              meta = MediaMeta("image", "png", w, h, 1, 0))
          case None => r
        }
    }
  }
}
