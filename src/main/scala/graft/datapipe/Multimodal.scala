package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample as batched partition-level
  * transforms (the Scala analog of `mapInPandas` — one buffer per
  * batch, amortized init, vectorizable shape).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` parses a deterministic fake header instead
  * of calling a real decoder. Everything around it — schema, typed
  * Datasets, batch iteration, partitioning — is real and tested, so a
  * real decoder drops in by replacing one function.
  */
object Multimodal {

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
        decodeStub(r.data).map { case (meta, payload) =>
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
        decodeStub(r.data).map { case (meta, payload) =>
          var sum = 0L
          var i = 0
          while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
          (r.media_id, meta.modality, r.data.length.toLong, sum, payload.length.toLong)
        }
      }
    }.toDF("media_id", "modality", "n_bytes", "sum_bytes", "n_payload")
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

  /** "Resize" stub: rewrite metadata + re-encode header (a real impl
    * transforms pixels; shape/partitioning identical). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      decodeStub(r.data) match {
        case Some((meta, payload)) =>
          r.copy(
            data = encodeFake(meta.modality, w, h, meta.nFrames, meta.sampleRate, payload),
            meta = meta.copy(width = w, height = h))
        case None => r
      }
    }
  }
}
