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
}
