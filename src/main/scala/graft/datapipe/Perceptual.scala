package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.datapipe.Multimodal.{MediaMeta, MediaRow}

/** Perceptual image hashing — multimodal near-dup dedup as a
  * first-class operator, composing two things the engine already has:
  * REAL image decode ([[Multimodal.decodeImage]], `javax.imageio`)
  * and the exact hamming pigeonhole blocking
  * ([[DedupOps.hammingNearDupPairs]]).
  *
  * dHash (difference hash): downscale the luminance plane to a 9×8
  * grid and emit one bit per horizontally-adjacent cell comparison —
  * 64 bits, robust to brightness shifts and mild noise. aHash
  * (average hash) compares each 8×8 cell against the global mean.
  * Both are computed from integer cell SUMS, never averages: cells
  * have equal pixel counts, so sum comparisons are the same order
  * with zero rounding — and an SQL oracle can recompute them exactly.
  *
  * Scale shape: hashing is per-row work behind one `mapPartitions`
  * (decode amortized per batch, as all Multimodal stages); pairing is
  * the shared pigeonhole blocking — candidates agree on ≥ 1 of
  * (maxHamming+1) hash blocks, so no all-pairs stage exists anywhere,
  * and a 100 TB image corpus shuffles only (id, 8-byte hash) rows.
  */
object Perceptual {

  // memory-backed ImageIO streams (see the Multimodal note): synthPng's
  // encode runs before any Multimodal call, so set the flag here too
  javax.imageio.ImageIO.setUseCache(false)

  val W = 72 // 9 cell columns × 8 px
  val H = 64 // 8 cell rows × 8 px

  /** Deterministic synthetic luminance for (id, x, y) — xor mixing so
    * different ids give UNCORRELATED dHash bits (an additive offset
    * would shift all cells monotonically and preserve comparisons).
    * Engine-portable: same integer arithmetic in Spark and DuckDB
    * (all intermediates positive, xor of two positive longs). Docs
    * with id % 10 == 1 are planted near-dups of id − 1: same base
    * image plus +5 on the sparse (x·64+y) % 37 == 0 pixel lattice —
    * measured hamming ≤ 3 vs ≥ 14 for unrelated pairs at sf0.01. */
  def synthPixel(id: Long, x: Int, y: Int): Int = {
    def base(bid: Long): Int =
      (16 + (((bid + 1) * 2654435761L + x * 40503L) ^
        (y * 65027L + x.toLong * y * 2246822519L)) % 224).toInt
    if (id % 10 == 1)
      base(id - 1) + (if ((x * 64 + y) % 37 == 0) 5 else 0)
    else base(id)
  }

  /** The real PNG bytes for one document id (RGB gray pixels,
    * r = g = b = v, so the BT.601 integer luminance in
    * [[Multimodal.decodeImage]] recovers v EXACTLY:
    * (v·299 + v·587 + v·114)/1000 = v — the whole ImageIO
    * encode→decode loop is lossless for the oracle. TYPE_INT_RGB, not
    * TYPE_BYTE_GRAY: the gray color space would gamma-convert in
    * getRGB and break integer exactness.) */
  def synthPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val v = synthPixel(id, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One real PNG per document (see [[synthPng]]). The id relation is
    * explicitly repartitioned to the cluster parallelism: the input is
    * a few KB of ids but the per-row work is a real codec round-trip,
    * so inheriting the parquet scan's 1-2 partitions would serialize
    * the whole corpus encode on a couple of cores. */
  def synthPngTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => MediaRow(id, synthPng(id), MediaMeta("image", "png", W, H, 1, 0)))
  }

  /** 64-bit dHash over a row-major luminance plane: cell (cx, cy) sums
    * the (w/9)×(h/8) block; bit cy·8+cx = 1 iff sum(cx+1, cy) >
    * sum(cx, cy). Requires w ≥ 9 and h ≥ 8; trailing pixels beyond the
    * 9/8 grid (when w, h are not multiples) are ignored on both
    * engines. */
  def dHash64(lum: Array[Byte], w: Int, h: Int): Long = {
    require(w >= 9 && h >= 8, s"dHash needs >= 9x8 pixels, got ${w}x$h")
    val cw = w / 9
    val ch = h / 8
    val sums = new Array[Long](8 * 9)
    var y = 0
    while (y < ch * 8) {
      val cy = y / ch
      var x = 0
      while (x < cw * 9) {
        sums(cy * 9 + x / cw) += lum(y * w + x) & 0xff
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (sums(cy * 9 + cx + 1) > sums(cy * 9 + cx)) bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** 64-bit aHash: 8×8 cell grid, bit = 1 iff cell sum · 64 > total
    * sum (integer cross-multiplication — no float mean). */
  def aHash64(lum: Array[Byte], w: Int, h: Int): Long = {
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    val cw = w / 8
    val ch = h / 8
    val sums = new Array[Long](8 * 8)
    var total = 0L
    var y = 0
    while (y < ch * 8) {
      val cy = y / ch
      var x = 0
      while (x < cw * 8) {
        val v = lum(y * w + x) & 0xff
        sums(cy * 8 + x / cw) += v
        total += v
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) * 64 > total) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** media → (id, simhash = dHash) through the REAL decode path.
    * Rows that fail to decode drop (same contract as every
    * [[Multimodal]] stage); images smaller than the 9×8 grid drop
    * too, logged by absence not exception. */
  def dhashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Multimodal.decode(r.data).collect {
          case (meta, payload)
              if meta.modality == "image" && meta.width >= 9 && meta.height >= 8 =>
            (r.media_id, dHash64(payload, meta.width, meta.height))
        }
      }
    }.toDF("id", "simhash")
  }

  /** Perceptual near-dup pairs: decode → dHash → exact pigeonhole
    * hamming blocking. Output (id_a, id_b, hamming ≤ maxHamming). */
  def imageNearDupPairs(media: Dataset[MediaRow], maxHamming: Int): DataFrame =
    DedupOps.hammingNearDupPairs(dhashes(media), maxHamming)

  /** Decode-once fused q92 pipeline over the synthetic corpus: pixels
    * → REAL PNG encode → REAL ImageIO decode → dHash, all inside ONE
    * mapPartitions pass — each image is materialized exactly once and
    * its bytes never cross an operator boundary (the composed
    * [[synthPngTable]]→[[dhashes]] form serializes every PNG through
    * the MediaRow encoder between the two typed operators). Output
    * and determinism are IDENTICAL to the composed form (spec-pinned);
    * only the plan shape differs. Same explicit repartition rationale
    * as [[synthPngTable]]: heavy per-row codec work on a tiny input
    * must not inherit the parquet scan's partition count. */
  def synthDhashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          Multimodal.decodeImage(synthPng(id)).collect {
            case (meta, lum) if meta.width >= 9 && meta.height >= 8 =>
              (id, dHash64(lum, meta.width, meta.height))
          }
        }
      }.toDF("id", "simhash")
  }

  /** Fused q92: [[synthDhashes]] → exact pigeonhole hamming pairs. */
  def synthImageNearDupPairs(spark: SparkSession, docs: DataFrame,
      maxHamming: Int): DataFrame =
    DedupOps.hammingNearDupPairs(synthDhashes(spark, docs), maxHamming)
}
