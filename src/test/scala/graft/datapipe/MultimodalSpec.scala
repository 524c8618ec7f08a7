package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("fake media table has binary data + typed metadata") {
    val media = Multimodal.fakeMediaTable(spark, docs)
    val schema = media.schema
    assert(schema("data").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val n = media.count()
    assert(n == docs.count())
    val mods = media.toDF().select(col("meta.modality")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("decode roundtrip preserves metadata and payload") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val data = Multimodal.encodeFake("image", 640, 480, 1, 0, payload)
    val Some((meta, decoded)) = Multimodal.decodeStub(data)
    assert(meta.modality == "image")
    assert(meta.width == 640 && meta.height == 480)
    assert(new String(decoded, "UTF-8") == "hello multimodal")
    assert(Multimodal.decodeStub("garbage".getBytes).isEmpty)
  }

  test("batched feature extraction is deterministic and complete") {
    val media = Multimodal.fakeMediaTable(spark, docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.mean_intensity > 0.0)
      assert(f.feature_vec.length == 16)
    }
    // determinism
    val again = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f.checksum).toMap
    feats.foreach(f => assert(again(f.media_id) == f.checksum))
  }

  test("frame sampling and resize plumbing") {
    val media = Multimodal.fakeMediaTable(spark, docs)
    val frames = Multimodal.sampleFrames(media, stride = 5).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val sampled = r.getSeq[Int](r.fieldIndex("sampled_frames"))
      assert(sampled.nonEmpty && sampled.head == 0)
    }
    val resized = Multimodal.resize(media, 32, 32)
    assert(resized.collect().forall(r => r.meta.width == 32 && r.meta.height == 32))
    // payload survives the resize re-encode
    val one = resized.filter(_.media_id == 0).head()
    val Some((_, payload)) = Multimodal.decodeStub(one.data)
    assert(payload.nonEmpty)
  }

  /** A w×h PNG with a deterministic gradient: pixel (x,y) is the gray
    * level (x + y) % 256 — luminance == gray level, so byte sums are
    * exactly predictable after decode. */
  def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x + y) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG bytes decode through javax.imageio with exact luminance") {
    val png = gradientPng(40, 25)
    val Some((meta, payload)) = Multimodal.decodeImage(png)
    assert(meta.modality == "image" && meta.format == "png")
    assert(meta.width == 40 && meta.height == 25 && meta.nFrames == 1)
    assert(payload.length == 40 * 25)
    // gray pixels: BT.601 luminance of (v,v,v) is exactly v
    for (y <- 0 until 25; x <- 0 until 40)
      assert((payload(y * 40 + x) & 0xff) == (x + y) % 256)
    // dispatch: decode() routes PNG to the real decoder, fake to stub
    assert(Multimodal.decode(png).get._1.format == "png")
    val fake = Multimodal.encodeFake("audio", 0, 0, 1, 16000, Array[Byte](1, 2))
    assert(Multimodal.decode(fake).get._1.format == "fake")
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  /** 16-bit mono little-endian PCM WAV with a deterministic sample
    * ramp, written through javax.sound.sampled itself. */
  def rampWav(n: Int, sampleRate: Int = 8000): (Array[Byte], Array[Int]) = {
    val samples = Array.tabulate(n)(i => ((i * 37) % 65536) - 32768)
    val raw = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, samples)
  }

  test("real WAV bytes decode through javax.sound.sampled with exact samples") {
    val (wav, samples) = rampWav(500)
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    val Some((meta, payload)) = Multimodal.decodeAudio(wav)
    assert(meta.modality == "audio" && meta.format == "wav")
    assert(meta.width == 1 && meta.nFrames == 500 && meta.sampleRate == 8000)
    assert(payload.length == 500)
    // payload byte i is exactly the unsigned high byte of sample i
    for (i <- 0 until 500)
      assert((payload(i) & 0xff) == ((samples(i) >> 8) + 128),
        s"sample $i: ${samples(i)}")
    // dispatch: decode() routes RIFF to the audio decoder
    assert(Multimodal.decode(wav).get._1.modality == "audio")
    assert(Multimodal.decodeAudio("RIFFgarbagegarbage".getBytes).isEmpty)
  }

  test("real WAV rows flow through the batched feature/stats stages") {
    import spark.implicits._
    val (wav, samples) = rampWav(256)
    val rows = Seq(Multimodal.MediaRow(200L, wav,
      Multimodal.MediaMeta("audio", "wav", 1, 0, 256, 8000)))
    val stats = Multimodal.mediaStats(spark, spark.createDataset(rows)).collect()
    assert(stats.length == 1)
    val expectedSum = samples.map(s => (s >> 8) + 128).map(_.toLong).sum
    assert(stats(0).getString(1) == "audio")
    assert(stats(0).getLong(3) == expectedSum)
    assert(stats(0).getLong(4) == 256L)
  }

  test("real images flow through the batched feature/stats/resize stages") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(100L, gradientPng(16, 16),
        Multimodal.MediaMeta("image", "png", 16, 16, 1, 0)),
      // a fake-container audio row in the same partition: dispatch is per-row
      Multimodal.MediaRow(101L,
        Multimodal.encodeFake("audio", 0, 0, 1, 16000, Array[Byte](10, 20, 30)),
        Multimodal.MediaMeta("audio", "fake", 0, 0, 1, 16000)))
    val media = spark.createDataset(rows)
    val stats = Multimodal.mediaStats(spark, media).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3), r.getLong(4))).toMap
    val lumSum = (for (y <- 0 until 16; x <- 0 until 16) yield (x + y) % 256).sum.toLong
    assert(stats(100L) == (("image", lumSum, 256L)), stats(100L))
    assert(stats(101L) == (("audio", 60L, 3L)), stats(101L))
    // resize re-renders real pixels: output decodes as a 8x8 png
    val resized = Multimodal.resize(media, 8, 8).filter(_.media_id == 100L).head()
    val Some((rmeta, rpay)) = Multimodal.decodeImage(resized.data)
    assert(rmeta.width == 8 && rmeta.height == 8 && rmeta.format == "png")
    assert(rpay.length == 64)
  }

  test("audio frame features: real decode, driver replay, frame-local ZCR") {
    import spark.implicits._
    val docs = Seq(3L, 17L, 64L).toDF("doc_id")
    val media = Multimodal.synthWavTable(spark, docs)
    val got = Multimodal.audioFrameFeatures(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    for (id <- Seq(3L, 17L, 64L)) {
      val n = (200 + id % 100).toInt
      val s = Array.tabulate(n)(i => (((id * 7 + i * 37) % 65536) - 32768).toInt)
      val frames = (0 until n by 64)
      assert(got.keySet.count(_._1 == id) == frames.size)
      for (st <- frames) {
        val en = math.min(st + 64, n)
        val fr = s.slice(st, en)
        val zc = (st + 1 until en)
          .count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
        val want = ((en - st).toLong, fr.map(_.toLong).sum,
          fr.min.toLong, fr.max.toLong, zc)
        assert(got((id, (st / 64).toLong)) == want, s"id=$id frame=${st / 64}")
      }
      // trailing partial frame really is partial (n % 64 != 0 here)
      assert(got((id, (n - 1) / 64L))._1 == (n % 64 + (if (n % 64 == 0) 64 else 0)).toLong)
    }
    // a sign flip straddling a frame boundary is NOT counted: ZCR is
    // recomputable per frame in isolation (the oracle convention)
    val gotAll = got.filterKeys(_._1 == 3L).values.map(_._5).sum
    val s3 = Array.tabulate(203)(i => (((3L * 7 + i * 37) % 65536) - 32768).toInt)
    val zcGlobal = (1 until 203).count(i => (s3(i) >= 0) != (s3(i - 1) >= 0))
    val zcBoundaries = (1 until 203).filter(_ % 64 == 0)
      .count(i => (s3(i) >= 0) != (s3(i - 1) >= 0))
    assert(gotAll == (zcGlobal - zcBoundaries).toLong)
  }
}
