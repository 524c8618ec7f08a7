package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PerceptualSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docIds(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("PNG encode -> real ImageIO decode recovers synthPixel exactly") {
    val media = Perceptual.synthPngTable(spark, docIds(3)).collect()
    assert(media.length == 3)
    for (r <- media) {
      val (meta, payload) = Multimodal.decode(r.data).get
      assert(meta.modality == "image" && meta.format == "png")
      assert(meta.width == Perceptual.W && meta.height == Perceptual.H)
      for (y <- 0 until Perceptual.H; x <- 0 until Perceptual.W)
        assert((payload(y * Perceptual.W + x) & 0xff) ==
          Perceptual.synthPixel(r.media_id, x, y),
          s"pixel ($x,$y) of doc ${r.media_id}")
    }
  }

  test("fused decode-once pipeline equals the composed synth->dhash form") {
    val docs = docIds(60)
    val composed = Perceptual.dhashes(Perceptual.synthPngTable(spark, docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Perceptual.synthDhashes(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size == 60 && fused == composed)
  }

  test("dHash bit definition: horizontal gradient sets all compare bits") {
    // strictly increasing columns -> every right cell sum > left
    val lum = Array.tabulate(Perceptual.H * Perceptual.W) { i =>
      ((i % Perceptual.W) * 3).toByte
    }
    assert(Perceptual.dHash64(lum, Perceptual.W, Perceptual.H) == -1L)
    // flat image -> no bit set (strict >)
    val flat = Array.fill(Perceptual.H * Perceptual.W)(100.toByte)
    assert(Perceptual.dHash64(flat, Perceptual.W, Perceptual.H) == 0L)
  }

  test("aHash bit definition: half-dark half-bright splits the grid") {
    // left half 0, right half 200 -> right cells above mean, left below
    val lum = Array.tabulate(Perceptual.H * Perceptual.W) { i =>
      if (i % Perceptual.W < Perceptual.W / 2 /* 36 px = 4 cells + half */ ) 0.toByte
      else 200.toByte
    }
    val h = Perceptual.aHash64(lum, Perceptual.W, Perceptual.H)
    // cells 0..3 of each row fully dark (bit 0), cells 5..7 fully
    // bright (bit 1); cell 4 straddles the boundary (63/72 of total
    // mass is bright -> mean is just under half -> cell 4 is half
    // bright = above mean)
    for (cy <- 0 until 8; cx <- 0 until 4)
      assert((h >> (cy * 8 + cx) & 1L) == 0L, s"dark cell ($cx,$cy)")
    for (cy <- 0 until 8; cx <- 5 until 8)
      assert((h >> (cy * 8 + cx) & 1L) == 1L, s"bright cell ($cx,$cy)")
  }

  test("planted near-dups land within hamming 8; unrelated pairs stay out") {
    val media = Perceptual.synthPngTable(spark, docIds(60))
    val pairs = Perceptual.imageNearDupPairs(media, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = (1L until 60L by 10L).map(id => (id - 1, id)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == planted,
      s"expected exactly the planted pairs, got ${pairs.mkString(",")}")
    assert(pairs.forall(_._3 <= 3), s"planted hamming drifted: ${pairs.mkString(",")}")
  }

  test("pigeonhole blocking equals brute force on the dHash corpus") {
    val media = Perceptual.synthPngTable(spark, docIds(40))
    val hashes = Perceptual.dhashes(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 12
    } yield (ia, ib, h.toLong)).toSet
    val blocked = Perceptual.imageNearDupPairs(media, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute)
  }

  test("resized real PNGs still decode and hash through the same path") {
    // downscale survives the pipeline: decode -> resize -> dhash; the
    // hash of a downscaled image stays close to the original's (dHash
    // is a downscale itself)
    val media = Perceptual.synthPngTable(spark, docIds(4))
    val resized = Multimodal.resize(media, 36, 32)
    val orig = Perceptual.dhashes(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val small = Perceptual.dhashes(resized).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(small.keySet == orig.keySet)
    for ((id, h) <- small)
      assert(java.lang.Long.bitCount(h ^ orig(id)) <= 24,
        s"doc $id drifted ${java.lang.Long.bitCount(h ^ orig(id))} bits after resize")
  }
}
