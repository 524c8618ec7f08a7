package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video container METADATA parsing — the honest offline slice of the
  * video modality (builder brief; no reference counterpart). No video
  * codec ships in the JDK, so frame decode stays out of scope; what a
  * 100 TB curation pipeline actually needs first from video rows is
  * container metadata — duration, dimensions, frame count, track
  * count, codec fourcc — to filter, bucket and budget BEFORE any GPU
  * decode stage ever sees the bytes. Both walks below are pure
  * structure parses of public formats (Microsoft RIFF/AVI 1.0 and
  * ISO/IEC 14496-12 BMFF), bounded by the header region: they never
  * touch frame payloads, so cost per row is O(header), not O(bytes).
  *
  * The writers ([[synthAvi]]/[[synthMp4]]) emit REAL containers with
  * spec-correct chunk/box sizes so the parser is exercised end-to-end,
  * while every field derives from `doc_id` arithmetic — which is what
  * lets the q93 DuckDB oracle recompute the expected metadata without
  * parsing a byte (the q74/q92 pattern).
  */
object VideoContainer {

  final case class VideoMeta(
      container: String, // "avi" | "mp4"
      codec: String, // fourcc of the first video track
      width: Int,
      height: Int,
      nFrames: Long,
      durationMs: Long,
      nTracks: Int)

  final case class VideoRow(media_id: Long, data: Array[Byte])

  // ---------------------------------------------------------------
  // deterministic field derivation (mirrored arithmetically by the
  // q93 oracle — keep in sync with DataPipeQueries.videoMetaOracle)
  // ---------------------------------------------------------------

  private val Codecs = Array("mjpg", "h264", "vp80")
  private val UsPerFrame = Array(40000L, 33333L, 20000L)

  def fieldsFor(id: Long): VideoMeta = {
    val codec = Codecs((id % 3).toInt)
    val usf = UsPerFrame((id % 3).toInt)
    val w = 160 + (id % 16).toInt * 16
    val h = 120 + (id % 9).toInt * 8
    val nf = 24 + id % 240
    val durMs = nf * usf / 1000L
    val nTracks = 1 + ((id / 2) % 2).toInt
    VideoMeta(if (id % 2 == 0) "avi" else "mp4", codec, w, h, nf, durMs, nTracks)
  }

  // ---------------------------------------------------------------
  // little-endian RIFF/AVI writer + parser
  // ---------------------------------------------------------------

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    // RIFF chunks are word-aligned: odd-length bodies carry a pad byte
    // not counted in the size field.
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ le32(body.length.toLong) ++ body ++ pad
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(kind) ++ body)

  /** 56-byte `avih` main header (dwMicroSecPerFrame, dwTotalFrames,
    * dwStreams, dwWidth, dwHeight populated; rest zero). */
  private def avih(usPerFrame: Long, totalFrames: Long, streams: Int,
      w: Int, h: Int): Array[Byte] =
    chunk("avih", le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(totalFrames) ++ le32(0) ++ le32(streams.toLong) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))

  /** 56-byte `strh` stream header: fccType, fccHandler, dwScale/dwRate
    * (frame timing), dwLength (frame count). */
  private def strh(fccType: String, handler: String, scale: Long, rate: Long,
      length: Long): Array[Byte] =
    chunk("strh", fourcc(fccType) ++ fourcc(handler) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(scale) ++ le32(rate) ++ le32(0) ++ le32(length) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))

  /** Real RIFF/AVI container for `id`: hdrl (avih + one strl per
    * stream) + a movi LIST with two placeholder frame chunks. The
    * second stream, when present, is an `auds` track — the parser must
    * count it in n_tracks but NOT take its fourcc as the codec. */
  def synthAvi(id: Long): Array[Byte] = {
    val m = fieldsFor(id)
    val usf = UsPerFrame((id % 3).toInt)
    val vids = list("strl",
      strh("vids", m.codec, scale = usf, rate = 1000000L, length = m.nFrames) ++
        chunk("strf", le32(40) ++ le32(m.width.toLong) ++ le32(m.height.toLong) ++
          new Array[Byte](28)))
    val auds =
      if (m.nTracks > 1)
        list("strl", strh("auds", "    ", 1, 8000, 0) ++
          chunk("strf", new Array[Byte](16)))
      else Array.empty[Byte]
    val hdrl = list("hdrl",
      avih(usf, m.nFrames, m.nTracks, m.width, m.height) ++ vids ++ auds)
    val movi = list("movi",
      chunk("00dc", Array.fill(5)((id % 251).toByte)) ++
        chunk("00dc", Array.fill(7)(((id + 1) % 251).toByte)))
    val form = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(form.length.toLong) ++ form
  }

  // ---------------------------------------------------------------
  // big-endian ISO BMFF (MP4) writer + parser
  // ---------------------------------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(kind: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ fourcc(kind) ++ body

  /** Real ISO-BMFF container for `id`: ftyp + moov(mvhd + one trak per
    * track). The video trak carries tkhd (16.16 fixed-point w/h), hdlr
    * `vide`, stsd (entry fourcc = codec) and stts (single run holding
    * the frame count); the optional audio trak carries hdlr `soun` and
    * an `mp4a` stsd entry the parser must not mistake for the codec. */
  def synthMp4(id: Long): Array[Byte] = {
    val m = fieldsFor(id)
    val usf = UsPerFrame((id % 3).toInt)
    val ftyp = box("ftyp", fourcc("isom") ++ be32(512) ++ fourcc("isom") ++ fourcc("iso2"))
    // mvhd version 0: creation/modification (0), timescale 1000,
    // duration in ms; 80 trailing bytes (rate, volume, reserved,
    // matrix, predefined, next_track_ID) for the spec 100-byte body.
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++
      be32(m.durationMs) ++ new Array[Byte](80))
    def trak(handler: String, entryFourcc: String, w: Int, h: Int,
        frames: Long): Array[Byte] = {
      // version0 body: ver/flags, creation, modification, track_ID,
      // then 60 bytes (reserved, duration, reserved[8], layer/alt/
      // volume/reserved, matrix[36]) before the 16.16 width/height
      // at body offsets 76/80 — 84-byte body, 92-byte box.
      val tkhd = box("tkhd", be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++
        new Array[Byte](60) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
      val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000000) ++
        be32(frames * usf) ++ be32(0x55c40000L))
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++ fourcc(handler) ++
        new Array[Byte](12) ++ Array(0.toByte))
      val stsd = box("stsd", be32(0) ++ be32(1) ++
        box(entryFourcc, new Array[Byte](8)))
      val stts = box("stts", be32(0) ++ be32(1) ++ be32(frames) ++ be32(usf))
      val stbl = box("stbl", stsd ++ stts)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val vtrak = trak("vide", m.codec, m.width, m.height, m.nFrames)
    val atrak = if (m.nTracks > 1) trak("soun", "mp4a", 0, 0, 0) else Array.empty[Byte]
    ftyp ++ box("moov", mvhd ++ vtrak ++ atrak)
  }

  // ---------------------------------------------------------------
  // parsers — bounds-checked walks; corrupt/truncated bytes → None
  // ---------------------------------------------------------------

  private def rdLe32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
      ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24)

  private def rdBe32(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)

  private def rdBe64(d: Array[Byte], o: Int): Long =
    (rdBe32(d, o) << 32) | rdBe32(d, o + 4)

  private def cc(d: Array[Byte], o: Int): String =
    new String(d, o, 4, "US-ASCII")

  /** RIFF/AVI metadata walk: `avih` supplies dims/frame-count/stream
    * count/frame duration; the first `vids` strh supplies the codec.
    * Only the hdrl region is visited — frame data is never read. */
  def parseAvi(data: Array[Byte]): Option[VideoMeta] = {
    if (data == null || data.length < 12 || cc(data, 0) != "RIFF" ||
      cc(data, 8) != "AVI ") return None
    val end = math.min(data.length.toLong, 8 + rdLe32(data, 4)).toInt
    var usPerFrame = 0L; var totalFrames = 0L; var streams = 0
    var w = 0; var h = 0; var codec: String = null
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = cc(data, o)
        val sz = rdLe32(data, o + 4)
        val body = o + 8
        if (sz < 0 || body.toLong + sz > to) return
        id match {
          case "LIST" if sz >= 4 =>
            val kind = cc(data, body)
            if (kind == "hdrl" || kind == "strl")
              walk(body + 4, (body + sz).toInt)
          case "avih" if sz >= 40 =>
            usPerFrame = rdLe32(data, body)
            totalFrames = rdLe32(data, body + 16)
            streams = rdLe32(data, body + 24).toInt
            w = rdLe32(data, body + 32).toInt
            h = rdLe32(data, body + 36).toInt
          case "strh" if sz >= 8 =>
            if (cc(data, body) == "vids" && codec == null)
              codec = cc(data, body + 4)
          case _ => ()
        }
        o = body + sz.toInt + (sz.toInt & 1) // word alignment
      }
    }
    walk(12, end)
    if (codec == null || totalFrames == 0) None
    else Some(VideoMeta("avi", codec, w, h, totalFrames,
      totalFrames * usPerFrame / 1000L, streams))
  }

  /** ISO-BMFF metadata walk: mvhd → duration (ms via its timescale),
    * trak count, and within the `vide` trak tkhd dims, stsd entry
    * fourcc, stts frame-count sum. Boxes are length-prefixed, so the
    * walk skips mdat payloads without reading them. */
  def parseMp4(data: Array[Byte]): Option[VideoMeta] = {
    if (data == null || data.length < 12 || cc(data, 4) != "ftyp") return None
    var timescale = 0L; var duration = 0L; var nTracks = 0
    var w = 0; var h = 0; var nFrames = 0L; var codec: String = null
    // one trak at a time: remember whether the current trak is video;
    // tkhd precedes hdlr inside trak, so its dims stage in pendW/pendH
    // until the hdlr identifies the trak's handler type
    var inVide = false
    var pendW = 0; var pendH = 0
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val sz32 = rdBe32(data, o)
        val kind = cc(data, o + 4)
        // ISO 14496-12 §4.2 size forms: 1 → 64-bit largesize follows
        // the type; 0 → box extends to the end of the enclosing region
        var body = o + 8
        val boxEnd: Long =
          if (sz32 == 1L) {
            if (o + 16 > to) return
            body = o + 16
            o + rdBe64(data, o + 8)
          } else if (sz32 == 0L) to.toLong
          else o + sz32
        if (boxEnd < body || boxEnd > to) return
        val bodyEnd = boxEnd.toInt
        val psz = bodyEnd - body // payload bytes, whichever header form
        kind match {
          case "moov" => walk(body, bodyEnd, depth + 1)
          case "mvhd" if psz >= 20 =>
            timescale = rdBe32(data, body + 12)
            duration = rdBe32(data, body + 16)
          case "trak" =>
            nTracks += 1; inVide = false
            walk(body, bodyEnd, depth + 1)
          case "mdia" | "minf" | "stbl" => walk(body, bodyEnd, depth + 1)
          case "hdlr" if psz >= 12 =>
            inVide = cc(data, body + 8) == "vide"
          case "tkhd" if psz >= 84 =>
            pendW = (rdBe32(data, body + 76) >> 16).toInt
            pendH = (rdBe32(data, body + 80) >> 16).toInt
          case "stsd" if psz >= 16 =>
            if (inVide && codec == null) codec = cc(data, body + 12)
          case "stts" if psz >= 8 =>
            if (inVide) {
              val n = rdBe32(data, body + 4)
              var i = 0L
              while (i < n && body + 8 + i * 8 + 4 <= bodyEnd) {
                nFrames += rdBe32(data, (body + 8 + i * 8).toInt)
                i += 1
              }
            }
          case _ => ()
        }
        if (kind == "hdlr" && inVide) { w = pendW; h = pendH }
        o = bodyEnd
      }
    }
    walk(0, data.length, 0)
    if (codec == null || timescale == 0) None
    else Some(VideoMeta("mp4", codec, w, h, nFrames,
      duration * 1000L / timescale, nTracks))
  }

  /** Container-dispatching parse: RIFF+`AVI ` → [[parseAvi]], ftyp →
    * [[parseMp4]], anything else → None. */
  def parseVideoMeta(data: Array[Byte]): Option[VideoMeta] =
    if (data == null || data.length < 12) None
    else if (cc(data, 0) == "RIFF" && cc(data, 8) == "AVI ") parseAvi(data)
    else if (cc(data, 4) == "ftyp") parseMp4(data)
    else None

  /** One real container per document — AVI for even ids, MP4 for odd —
    * every field derived from [[fieldsFor]] so q93's oracle recomputes
    * the expected metadata arithmetically. */
  def synthVideoTable(spark: SparkSession, docs: DataFrame): Dataset[VideoRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      VideoRow(id, if (id % 2 == 0) synthAvi(id) else synthMp4(id))
    }
  }

  /** Batched metadata extraction (the mapInPandas shape): parse each
    * container's header region, drop corrupt rows. O(header) per row —
    * at 100 TB the movi/mdat payload bytes are never deserialized by
    * this stage (Spark still reads the column; projecting the binary
    * column away before wide payloads is the caller's job — the scan
    * prunes to (media_id, data) here by construction). */
  def videoMeta(spark: SparkSession, media: Dataset[VideoRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseVideoMeta(r.data).map { m =>
          (r.media_id, m.container, m.codec, m.width, m.height,
            m.nFrames, m.durationMs, m.nTracks)
        }
      }
    }.toDF("media_id", "container", "codec", "width", "height",
      "n_frames", "duration_ms", "n_tracks")
  }

  // ---------------------------------------------------------------
  // uncompressed-DIB frames: REAL frame decode (round 13)
  // ---------------------------------------------------------------

  /** DIB AVI geometry for `id`: width a multiple of 4 so each
    * bottom-up BGR row is 4-byte aligned with no DIB pad bytes. */
  def dibFieldsFor(id: Long): (Int, Int, Int) =
    (8 + (id % 5).toInt * 4, 6 + (id % 3).toInt * 2, 2 + (id % 3).toInt)

  /** Payload byte for channel `c` (0=B 1=G 2=R) of pixel (`x`,
    * DIB-row `y`) of frame `f` — pure doc-id arithmetic, the
    * q74/q92/q93 oracle convention (keep in sync with
    * DataPipeQueries.videoFramesOracle). */
  def dibByte(id: Long, f: Int, y: Int, x: Int, c: Int): Int =
    ((id + f * 31L + y * 7L + x * 3L + c) % 251).toInt

  /** Real RIFF/AVI container whose video stream is UNCOMPRESSED DIB
    * ('DIB ' handler, biCompression 0, one '00db' chunk per frame of
    * raw bottom-up BGR rows) — the one video codec decodable with no
    * codec library at all, which is what puts REAL frame decode in
    * scope for this slice (mjpg/h264/vp80 remain metadata-only,
    * honestly: no JDK codec). */
  def synthAviDib(id: Long): Array[Byte] = {
    val (w, h, nf) = dibFieldsFor(id)
    val usf = 40000L
    val vids = list("strl",
      strh("vids", "DIB ", scale = usf, rate = 1000000L, length = nf.toLong) ++
        chunk("strf", le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
          new Array[Byte](28)))
    val hdrl = list("hdrl", avih(usf, nf.toLong, 1, w, h) ++ vids)
    val frames = (0 until nf).map { f =>
      val px = new Array[Byte](h * w * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) { px(i) = dibByte(id, f, y, x, c).toByte; i += 1; c += 1 }
          x += 1
        }
        y += 1
      }
      chunk("00db", px)
    }.reduce(_ ++ _)
    val form = fourcc("AVI ") ++ hdrl ++ list("movi", frames)
    fourcc("RIFF") ++ le32(form.length.toLong) ++ form
  }

  def synthDibTable(spark: SparkSession, docs: DataFrame): Dataset[VideoRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map(id => VideoRow(id, synthAviDib(id)))
  }

  /** Decoded-frame statistics: exact integers so the whole decode is
    * hash-checkable. `sumLumaMilli` is Rec.601 luma ×1000
    * (299R + 587G + 114B) summed over every decoded pixel of every
    * frame; `cornerLumaMilli` is frame 0's decoded TOP-LEFT pixel —
    * which lives in the LAST stored DIB row, so the stat pins the
    * bottom-up row convention, not just byte sums. */
  final case class FrameStats(media_id: Long, width: Int, height: Int,
      n_frames_dec: Long, n_bytes: Long, sum_luma_milli: Long,
      corner_luma_milli: Long)

  /** REAL frame decode for one DIB AVI: header walk for geometry,
    * then every '00db' chunk interpreted as bottom-up BGR rows.
    * Returns None for non-AVI, non-DIB, or geometry-inconsistent
    * payloads (a truncated frame is corruption, not a partial
    * answer). */
  def decodeDib(data: Array[Byte]): Option[FrameStats] = {
    val meta = parseAvi(data).filter(_.codec == "DIB ").getOrElse(return None)
    val (w, h) = (meta.width, meta.height)
    if (w <= 0 || h <= 0) return None
    // geometry straight from untrusted header bytes: compute the frame
    // size in Long so a crafted w*h can't wrap to a small positive Int
    // that matches a chunk size and drive reads past the array
    val frameBytesL = w.toLong * h * 3L
    if (frameBytesL > Int.MaxValue || frameBytesL > data.length) return None
    val frameBytes = frameBytesL.toInt
    val end = math.min(data.length.toLong, 8 + rdLe32(data, 4)).toInt
    var nFrames = 0L
    var sumLuma = 0L
    var corner = -1L
    def decodeFrame(body: Int): Boolean = {
      var y = 0
      var i = body
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = data(i) & 0xff; val g = data(i + 1) & 0xff
          val r = data(i + 2) & 0xff
          sumLuma += 299L * r + 587L * g + 114L * b
          // decoded top-left = (x=0, top row) = LAST dib row
          if (nFrames == 0 && y == h - 1 && x == 0)
            corner = 299L * (data(i + 2) & 0xff) + 587L * (data(i + 1) & 0xff) +
              114L * (data(i) & 0xff)
          i += 3; x += 1
        }
        y += 1
      }
      true
    }
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = cc(data, o)
        val sz = rdLe32(data, o + 4)
        val body = o + 8
        if (sz < 0 || body.toLong + sz > to) return
        id match {
          case "LIST" if sz >= 4 && cc(data, body) == "movi" =>
            walk(body + 4, (body + sz).toInt)
          case "00db" =>
            if (sz != frameBytes) return // corrupt geometry: stop
            decodeFrame(body)
            nFrames += 1
          case _ => ()
        }
        o = body + sz.toInt + (sz.toInt & 1)
      }
    }
    walk(12, end)
    if (nFrames == 0 || corner < 0) None
    else Some(FrameStats(0L, w, h, nFrames, nFrames * frameBytes,
      sumLuma, corner))
  }

  /** Batched frame decode over a DIB video table (the [[videoMeta]]
    * mapPartitions shape — per-row work ∝ payload bytes, which is the
    * point: this IS the decode stage, emitting exact integer stats a
    * curation pipeline thresholds on). */
  def decodeDibFrames(spark: SparkSession,
      media: Dataset[VideoRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => decodeDib(r.data).map(_.copy(media_id = r.media_id)))
    }.toDF()
  }
}
