package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded per-partition.
  *
  * The decode step does REAL container parsing — PNG IHDR, BMP
  * BITMAPINFOHEADER, and WAV RIFF/fmt headers live in fixed bytes and
  * need no codec library. Payload synthesis plants genuine headers
  * (dimensions derived from doc_id) over the text bytes, so the parser
  * is exercised end-to-end and the driver oracle can recompute the
  * expected metadata arithmetically. Pixel/sample DECODING (IDAT
  * inflate, JPEG DCT, …) is out of scope in this environment — a
  * production decoder drops into [[MediaCodec.decode]]'s per-format
  * branches with the same bytes-in/features-out signature. */
object Multimodal {

  /** One media row: payload + format tag + source metadata. */
  final case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Parsed container metadata. `width`/`height` for images;
    * `sample_rate`/`channels` for audio; zeros where not applicable;
    * fmt is DETECTED from magic bytes, never trusted from the tag. */
  final case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int, channels: Int, checksum: Long)

  /** Header synthesis + parsing for the three fixed-header containers. */
  object MediaCodec {
    // ---- byte helpers ---------------------------------------------------
    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def rdBe32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def rdLe32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def rdLe16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    private val pngSig =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG: signature + IHDR chunk (len, type, 13-byte data, CRC) = 33
      * bytes before the first data chunk. */
    def pngHeader(width: Int, height: Int): Array[Byte] =
      pngSig ++ be32(13) ++ "IHDR".getBytes ++ be32(width) ++ be32(height) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bit depth, RGBA, no interlace; CRC unchecked

    /** BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40) = 54 bytes. */
    def bmpHeader(width: Int, height: Int, bodyLen: Int): Array[Byte] =
      "BM".getBytes ++ le32(54 + bodyLen) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(bodyLen) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)

    /** WAV: RIFF/WAVE + fmt chunk + data chunk header = 44 bytes. */
    def wavHeader(sampleRate: Int, channels: Int, bodyLen: Int): Array[Byte] = {
      val byteRate = sampleRate * channels * 2
      "RIFF".getBytes ++ le32(36 + bodyLen) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(sampleRate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16) ++
        "data".getBytes ++ le32(bodyLen)
    }

    /** Container detection from magic bytes (never trusts metadata). */
    def detect(p: Array[Byte]): String =
      if (p.length >= 24 && p.take(8).sameElements(pngSig)) "png"
      else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M') "bmp"
      else if (p.length >= 28 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
        "wav"
      else "unknown"

    /** Parse the fixed header fields of the detected container. */
    def decode(r: MediaRow): MediaFeatures = {
      val p = r.payload
      var sum = 0L
      var i = 0
      while (i < p.length) { sum = sum * 31 + (p(i) & 0xff); i += 1 }
      detect(p) match {
        case "png" =>
          MediaFeatures(r.doc_id, "png", p.length.toLong,
            rdBe32(p, 16), rdBe32(p, 20), 0, 0, sum)
        case "bmp" =>
          MediaFeatures(r.doc_id, "bmp", p.length.toLong,
            rdLe32(p, 18), rdLe32(p, 22), 0, 0, sum)
        case "wav" =>
          MediaFeatures(r.doc_id, "wav", p.length.toLong,
            0, 0, rdLe32(p, 24), rdLe16(p, 22), sum)
        case other =>
          MediaFeatures(r.doc_id, other, p.length.toLong, 0, 0, 0, 0, sum)
      }
    }
  }

  /** Wrap a text table as a binary media table: REAL container headers
    * (dimensions/rates derived from doc_id, so oracles can recompute
    * them) over the UTF-8 text bytes as the opaque body. */
  def asMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val body = text.getBytes("UTF-8")
      (id % 3) match {
        case 0 => MediaRow(id, "png",
          MediaCodec.pngHeader((id % 640).toInt + 1, (id % 480).toInt + 1) ++ body)
        case 1 => MediaRow(id, "bmp",
          MediaCodec.bmpHeader((id % 640).toInt + 1, (id % 480).toInt + 1, body.length) ++ body)
        case _ => MediaRow(id, "wav",
          MediaCodec.wavHeader(8000 + (id % 5).toInt * 8000, 1 + (id % 2).toInt, body.length) ++ body)
      }
    }
  }

  /** REAL frame/sample clipping for WAV payloads: truncates the data
    * chunk to at most `maxSamples` per channel and rewrites both RIFF
    * sizes — pure byte surgery on the container, no codec needed. The
    * audio analog of video frame-sampling for training-data curation
    * (cap every clip at N seconds). Non-WAV payloads pass through. */
  def clipWav(payload: Array[Byte], maxSamples: Int): Array[Byte] = {
    if (MediaCodec.detect(payload) != "wav") return payload
    val channels = (payload(22) & 0xff) | ((payload(23) & 0xff) << 8)
    val bytesPerSample = channels * 2 // planted headers are 16-bit PCM
    val body = payload.length - 44
    val keep = math.min(body, maxSamples * bytesPerSample)
    val out = java.util.Arrays.copyOf(payload, 44 + keep)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(4, 36 + keep) // RIFF size
    putLe32(40, keep) // data size
    out
  }

  /** Image resize STUB: rewrites the container's dimension fields (real
    * byte surgery, same offsets the parser reads) but keeps the opaque
    * body — an actual pixel resample needs a codec, which this
    * environment lacks. A production implementation replaces the body
    * write; everything else (detection, header layout, plumbing) is the
    * real job. */
  def resizeHeaderStub(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    MediaCodec.detect(payload) match {
      case "png" =>
        val out = payload.clone()
        def putBe32(off: Int, v: Int): Unit = {
          out(off) = ((v >> 24) & 0xff).toByte
          out(off + 1) = ((v >> 16) & 0xff).toByte
          out(off + 2) = ((v >> 8) & 0xff).toByte
          out(off + 3) = (v & 0xff).toByte
        }
        putBe32(16, width); putBe32(20, height)
        out
      case "bmp" =>
        val out = payload.clone()
        def putLe32(off: Int, v: Int): Unit = {
          out(off) = (v & 0xff).toByte
          out(off + 1) = ((v >> 8) & 0xff).toByte
          out(off + 2) = ((v >> 16) & 0xff).toByte
          out(off + 3) = ((v >> 24) & 0xff).toByte
        }
        putLe32(18, width); putLe32(22, height)
        out
      case _ => payload
    }

  /** Feature-extraction pipeline: Dataset-typed mapPartitions so a
    * (heavyweight, real-world) decoder initializes once per partition,
    * not per row. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here in a real decoder
      it.map(MediaCodec.decode)
    }
  }

  /** Parsed AVI metadata (fps = 1e6 ÷ dwMicroSecPerFrame, floored). */
  final case class VideoFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, fps: Int)

  /** AVI (RIFF) container synthesis, parsing, and frame sampling —
    * the video analog of [[clipWav]] for training-data curation
    * ("keep every Nth frame"). The container is spec-shaped RIFF:
    * `RIFF('AVI ' LIST('hdrl' avih(56 bytes)) LIST('movi' frames))`,
    * with the standard avih main-header fields (dwMicroSecPerFrame,
    * dwTotalFrames, dwSuggestedBufferSize = frame size, dwWidth,
    * dwHeight) at their real offsets; frame PAYLOAD decoding (actual
    * video codecs) is the documented drop-in, exactly like PNG IDAT
    * in [[resizeHeaderStub]]. All sizes live in the container, so
    * sampling is pure byte surgery and features re-extract from the
    * transformed bytes. */
  object VideoCodec {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rdLe32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte
      b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte
      b(o + 3) = ((v >> 24) & 0xff).toByte
    }

    /** Header layout: RIFF(12) LIST-hdrl(12) avih(8+56) LIST-movi(12)
      * → frame body starts at offset 100. */
    val BodyOff = 100

    /** Build an AVI payload: `nFrames` frames of `frameSize` bytes,
      * frame content cycled from `fill` (content is opaque; the
      * metadata is what the pipeline reads). */
    def buildAvi(width: Int, height: Int, usPerFrame: Int, nFrames: Int,
        frameSize: Int, fill: Array[Byte]): Array[Byte] = {
      val bodyLen = nFrames * frameSize
      val out = new Array[Byte](BodyOff + bodyLen)
      def putTag(o: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, o, 4)
      }
      putTag(0, "RIFF"); putLe32(out, 4, 92 + bodyLen); putTag(8, "AVI ")
      putTag(12, "LIST"); putLe32(out, 16, 68); putTag(20, "hdrl")
      putTag(24, "avih"); putLe32(out, 28, 56)
      putLe32(out, 32, usPerFrame) // dwMicroSecPerFrame
      putLe32(out, 48, nFrames) // dwTotalFrames
      putLe32(out, 56, 1) // dwStreams
      putLe32(out, 60, frameSize) // dwSuggestedBufferSize
      putLe32(out, 64, width); putLe32(out, 68, height)
      putTag(88, "LIST"); putLe32(out, 92, 4 + bodyLen); putTag(96, "movi")
      var i = 0
      while (i < bodyLen && fill.length > 0) {
        out(BodyOff + i) = fill(i % fill.length); i += 1
      }
      out
    }

    def isAvi(p: Array[Byte]): Boolean =
      p.length >= BodyOff && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'A' && p(9) == 'V' && p(10) == 'I' &&
        p(11) == ' '

    /** Parse avih fields back out of the container bytes. */
    def decodeAvi(r: MediaRow): VideoFeatures = {
      val p = r.payload
      if (!isAvi(p))
        VideoFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0, 0, 0)
      else {
        val upf = rdLe32(p, 32)
        VideoFeatures(r.doc_id, "avi", p.length.toLong,
          rdLe32(p, 64), rdLe32(p, 68), rdLe32(p, 48),
          if (upf > 0) 1000000 / upf else 0)
      }
    }

    /** Keep every `step`-th frame (0, step, 2·step, …) and rewrite
      * dwTotalFrames, the movi LIST size, and the RIFF size — real
      * container surgery, no codec. Non-AVI payloads pass through. */
    def frameSample(payload: Array[Byte], step: Int): Array[Byte] = {
      if (!isAvi(payload) || step <= 1) return payload
      val frameSize = rdLe32(payload, 60)
      val n = rdLe32(payload, 48)
      if (n == 0 || frameSize <= 0) return payload
      val kept = (n - 1) / step + 1
      val out = new Array[Byte](BodyOff + kept * frameSize)
      System.arraycopy(payload, 0, out, 0, BodyOff)
      var k = 0
      while (k < kept) {
        System.arraycopy(payload, BodyOff + k * step * frameSize,
          out, BodyOff + k * frameSize, frameSize)
        k += 1
      }
      putLe32(out, 4, 92 + kept * frameSize) // RIFF size
      putLe32(out, 48, kept) // dwTotalFrames
      putLe32(out, 92, 4 + kept * frameSize) // movi LIST size
      out
    }
  }

  /** Parsed JPEG metadata: dimensions from the SOF0 frame header,
    * plus the marker-segment count before the scan (structure probe). */
  final case class JpegFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, n_segments: Int)

  /** JFIF/JPEG container build + marker-walk parse. Unlike the
    * fixed-offset PNG/BMP/WAV headers, JPEG metadata lives in a
    * variable-length marker-segment chain — the parser WALKS it
    * (marker, big-endian length, skip) until the scan starts, exactly
    * how real dimension sniffers work; nothing is read at an assumed
    * offset. */
  final case class TiffFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, orientation: Int, n_entries: Int, n_ifds: Int)

  /** TIFF/EXIF baseline containers: the IFD (Image File Directory)
    * walk — tag/type/count/value entry tables chained by next-IFD
    * offsets, in EITHER byte order ("II" little- or "MM" big-endian,
    * the endianness dimension none of the other containers have).
    * Reference bertrand/types/object.py (opaque object payloads with
    * typed decode dispatch); layout per the public TIFF 6.0 spec. */
  object TiffCodec {
    private def w16(le: Boolean, v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def w32(le: Boolean, v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def r16(b: Array[Byte], o: Int, le: Boolean): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def r32(b: Array[Byte], o: Int, le: Boolean): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      else ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    /** A 12-byte IFD entry with an inline (left-justified) SHORT value. */
    private def entry(le: Boolean, tag: Int, v: Int): Array[Byte] =
      w16(le, tag) ++ w16(le, 3 /* SHORT */) ++ w32(le, 1) ++
        w16(le, v) ++ w16(le, 0)

    /** Header + IFD0 (width/height/orientation [+ bits]) +
      * optional IFD1 (thumbnail dims) + opaque body. Offsets are real:
      * IFD0 at 8, IFD1 (if present) directly after IFD0, body after
      * the last IFD — the parser must FOLLOW them, not assume them. */
    def buildTiff(le: Boolean, width: Int, height: Int, orientation: Int,
        withBits: Boolean, withThumb: Boolean, body: Array[Byte]): Array[Byte] = {
      val n0 = 3 + (if (withBits) 1 else 0)
      val ifd0Size = 2 + n0 * 12 + 4
      val ifd1Off = if (withThumb) 8 + ifd0Size else 0
      val e0 = entry(le, 0x0100, width) ++ entry(le, 0x0101, height) ++
        (if (withBits) entry(le, 0x0102, 8) else Array.emptyByteArray) ++
        entry(le, 0x0112, orientation)
      val ifd0 = w16(le, n0) ++ e0 ++ w32(le, ifd1Off)
      val ifd1 =
        if (!withThumb) Array.emptyByteArray
        else w16(le, 2) ++ entry(le, 0x0100, width / 8 + 1) ++
          entry(le, 0x0101, height / 8 + 1) ++ w32(le, 0)
      val bom: Array[Byte] =
        if (le) Array('I'.toByte, 'I'.toByte) else Array('M'.toByte, 'M'.toByte)
      bom ++ w16(le, 42) ++ w32(le, 8) ++ ifd0 ++ ifd1 ++ body
    }

    def isTiff(p: Array[Byte]): Boolean =
      p.length >= 8 &&
        ((p(0) == 'I' && p(1) == 'I') || (p(0) == 'M' && p(1) == 'M')) &&
        r16(p, 2, p(0) == 'I') == 42

    /** Walk the IFD chain: byte order from the BOM, magic 42 checked,
      * each IFD's entry table scanned for the dimension/orientation
      * tags (IFD0 wins — later IFDs are thumbnails), entries counted
      * across ALL IFDs. Structural damage (offset past the buffer,
      * short entry table, a cycle) → zeros, never a throw. */
    def decodeTiff(r: MediaRow): TiffFeatures = {
      val p = r.payload
      if (!isTiff(p))
        return TiffFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0, 0, 0, 0)
      val le = p(0) == 'I'
      var off = r32(p, 4, le)
      var w = 0; var h = 0; var ori = 0
      var nE = 0; var nI = 0
      var ok = true
      while (ok && off != 0) {
        if (off < 8 || off + 2 > p.length || nI > 64) ok = false
        else {
          val n = r16(p, off, le)
          if (off + 2 + n * 12 + 4 > p.length) ok = false
          else {
            var i = 0
            while (i < n) {
              val eo = off + 2 + i * 12
              val tag = r16(p, eo, le)
              val typ = r16(p, eo + 2, le)
              if (typ == 3 && nI == 0) { // SHORT, IFD0 only
                val v = r16(p, eo + 8, le) // inline, left-justified
                if (tag == 0x0100) w = v
                else if (tag == 0x0101) h = v
                else if (tag == 0x0112) ori = v
              }
              i += 1
            }
            nE += n
            nI += 1
            off = r32(p, off + 2 + n * 12, le)
          }
        }
      }
      if (!ok) TiffFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0, 0, 0, 0)
      else TiffFeatures(r.doc_id, "tiff", p.length.toLong, w, h, ori, nE, nI)
    }
  }

  /** Parsed MP4 movie metadata (see [[Mp4Codec]]). */
  final case class Mp4Features(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, timescale: Int, duration_ms: Long,
      n_tracks: Int, n_boxes: Int, max_depth: Int)

  /** MP4 / ISO-BMFF (ISO 14496-12) box-tree parsing — the NESTED
    * container dimension the other codecs don't have: boxes are
    * [size:u32be][4cc type][payload], and container boxes (moov, trak,
    * mdia, minf, stbl) hold a child box LIST in their payload, so the
    * parser is a recursive descent over a tree, not a linear chain
    * (m4's markers) or an offset chain (m5's IFDs). Synthesis plants a
    * real ftyp + moov{mvhd, trak{tkhd, mdia{mdhd, hdlr}}×n} + mdat
    * tree with spec-exact full-box layouts; every child must lie
    * INSIDE its parent's extent and the walk is depth-capped, so
    * structural damage (short box, size past parent, nesting bomb)
    * fails clean to zeros, never a throw or an overrun. */
  object Mp4Codec {
    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def rdBe32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    /** [size][type][payload] box. */
    def box(tp: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ tp.getBytes("US-ASCII") ++ payload

    private def zeros(n: Int): Array[Byte] = new Array[Byte](n)
    /** Unity transform matrix (9 × 16.16/2.30 fixed). */
    private def matrix: Array[Byte] =
      be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x10000) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000)

    /** ftyp + moov{mvhd, nTracks×trak{tkhd, mdia{mdhd, hdlr}}} + mdat.
      * All layouts are the version-0 full-box shapes of 14496-12:
      * mvhd 108 B, tkhd 92 B, mdhd 32 B, hdlr 33 B (1-byte name). */
    def buildMp4(width: Int, height: Int, timescale: Int, duration: Int,
        nTracks: Int, body: Array[Byte]): Array[Byte] = {
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(512) ++ "mp41".getBytes("US-ASCII"))
      val mvhd = box("mvhd", zeros(4) ++ zeros(8) ++ be32(timescale) ++
        be32(duration) ++ be32(0x00010000) ++ be16(0x0100) ++ zeros(10) ++
        matrix ++ zeros(24) ++ be32(nTracks + 1))
      val traks = (1 to nTracks).map { tid =>
        val tkhd = box("tkhd", zeros(4) ++ zeros(8) ++ be32(tid) ++
          zeros(4) ++ be32(duration) ++ zeros(8) ++ be16(0) ++ be16(0) ++
          be16(0) ++ be16(0) ++ matrix ++ be32(width << 16) ++ be32(height << 16))
        val mdhd = box("mdhd", zeros(4) ++ zeros(8) ++ be32(timescale) ++
          be32(duration) ++ be16(0x55c4) ++ be16(0))
        val hdlr = box("hdlr", zeros(4) ++ zeros(4) ++
          (if (tid == 1) "vide" else "soun").getBytes("US-ASCII") ++
          zeros(12) ++ zeros(1))
        box("trak", tkhd ++ box("mdia", mdhd ++ hdlr))
      }.reduce(_ ++ _)
      ftyp ++ box("moov", mvhd ++ traks) ++ box("mdat", body)
    }

    def isMp4(p: Array[Byte]): Boolean =
      p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

    private val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    private val maxDepthCap = 32

    /** Recursive-descent walk of the box tree. First tkhd wins the
      * dimensions (later tracks are audio); mvhd yields the movie
      * timescale/duration; every box counted, nesting depth tracked. */
    def decodeMp4(r: MediaRow): Mp4Features = {
      val p = r.payload
      if (!isMp4(p))
        return Mp4Features(r.doc_id, "unknown", p.length.toLong, 0, 0, 0, 0L, 0, 0, 0)
      var w = 0; var h = 0; var ts = 0; var dur = 0L
      var tracks = 0; var boxes = 0; var maxD = 0
      var ok = true
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > maxDepthCap) { ok = false; return }
        var i = start
        while (ok && i < end) {
          if (i + 8 > end) { ok = false; return }
          val sz = rdBe32(p, i)
          if (sz < 8 || i.toLong + sz > end) { ok = false; return }
          val tp = new String(p, i + 4, 4, "US-ASCII")
          boxes += 1
          if (depth > maxD) maxD = depth
          if (containers(tp)) {
            if (tp == "trak") tracks += 1
            walk(i + 8, i + sz, depth + 1)
          } else if (tp == "mvhd") {
            if (sz < 108) ok = false
            else { ts = rdBe32(p, i + 20); dur = rdBe32(p, i + 24) & 0xffffffffL }
          } else if (tp == "tkhd") {
            if (sz < 92) ok = false
            else if (w == 0) {
              w = rdBe32(p, i + 84) >>> 16; h = rdBe32(p, i + 88) >>> 16
            }
          }
          i += sz
        }
      }
      walk(0, p.length, 1)
      if (!ok)
        Mp4Features(r.doc_id, "unknown", p.length.toLong, 0, 0, 0, 0L, 0, 0, 0)
      else Mp4Features(r.doc_id, "mp4", p.length.toLong, w, h, ts,
        if (ts > 0) dur * 1000L / ts else 0L, tracks, boxes, maxD)
    }
  }

  /** Parsed ZIP archive metadata (see [[ZipCodec]]). */
  final case class ZipFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      n_entries: Int, total_uncomp: Long, cd_offset: Long)

  /** ZIP (PKWARE APPNOTE) central-directory parsing — the
    * FOOTER-DIRECTED container dimension none of the other codecs
    * have: the authoritative index lives at the END (EOCD record →
    * central directory offset → per-entry local-header back-pointers),
    * exactly the layout parquet uses, so the parser reads BACKWARD
    * first — scan for the EOCD signature from the tail, jump to the
    * central directory, walk its variable-length entries, and
    * cross-check every entry's local-file-header signature at its
    * recorded offset. Entries use store (method 0); damage (no EOCD,
    * dangling CD offset, wrong entry count, corrupt LFH pointer)
    * fails clean to zeros. */
  object ZipCodec {
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rdLe16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def rdLe32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    private val lfhSig = 0x04034b50L
    private val cdeSig = 0x02014b50L
    private val eocdSig = 0x06054b50L

    /** n stored entries named f<i>.txt with the given data slices. */
    def buildZip(datas: Seq[Array[Byte]]): Array[Byte] = {
      val names = datas.indices.map(i => s"f$i.txt".getBytes("US-ASCII"))
      var off = 0
      val offsets = new Array[Int](datas.length)
      val locals = datas.indices.map { i =>
        offsets(i) = off
        val d = datas(i)
        val lfh = le32(lfhSig.toInt) ++ le16(20) ++ le16(0) ++ le16(0) ++
          le16(0) ++ le16(0) ++ le32(0) ++ le32(d.length) ++ le32(d.length) ++
          le16(names(i).length) ++ le16(0) ++ names(i) ++ d
        off += lfh.length
        lfh
      }
      val cdStart = off
      val cd = datas.indices.map { i =>
        val d = datas(i)
        le32(cdeSig.toInt) ++ le16(20) ++ le16(20) ++ le16(0) ++ le16(0) ++
          le16(0) ++ le16(0) ++ le32(0) ++ le32(d.length) ++ le32(d.length) ++
          le16(names(i).length) ++ le16(0) ++ le16(0) ++ le16(0) ++ le16(0) ++
          le32(0) ++ le32(offsets(i)) ++ names(i)
      }
      val cdSize = cd.map(_.length).sum
      val eocd = le32(eocdSig.toInt) ++ le16(0) ++ le16(0) ++
        le16(datas.length) ++ le16(datas.length) ++ le32(cdSize) ++
        le32(cdStart) ++ le16(0)
      (locals ++ cd).reduce(_ ++ _) ++ eocd
    }

    /** Backward EOCD scan (bounded by the 64 KiB max comment), then
      * the forward central-directory walk with LFH cross-checks. */
    def decodeZip(r: MediaRow): ZipFeatures = {
      val p = r.payload
      def fail = ZipFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0L, 0L)
      if (p.length < 22) return fail
      var e = p.length - 22
      val floor = math.max(0, p.length - 22 - 0xffff)
      while (e >= floor && rdLe32(p, e) != eocdSig) e -= 1
      if (e < floor) return fail
      val nEntries = rdLe16(p, e + 10)
      val cdOff = rdLe32(p, e + 16)
      if (cdOff < 0 || cdOff > e) return fail
      var i = cdOff.toInt
      var n = 0
      var total = 0L
      var ok = true
      while (ok && n < nEntries) {
        if (i + 46 > e || rdLe32(p, i) != cdeSig) ok = false
        else {
          val uncomp = rdLe32(p, i + 24)
          val nameLen = rdLe16(p, i + 28)
          val extraLen = rdLe16(p, i + 30)
          val commentLen = rdLe16(p, i + 32)
          val lfhOff = rdLe32(p, i + 42)
          if (lfhOff < 0 || lfhOff + 4 > cdOff ||
            rdLe32(p, lfhOff.toInt) != lfhSig) ok = false
          else {
            total += uncomp
            n += 1
            i += 46 + nameLen + extraLen + commentLen
          }
        }
      }
      if (!ok || i != e) fail
      else ZipFeatures(r.doc_id, "zip", p.length.toLong, n, total, cdOff)
    }
  }

  /** Parsed TAR archive metadata (see [[TarCodec]]). */
  final case class TarFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      n_files: Int, total_size: Long, data_blocks: Long)

  /** POSIX ustar TAR parsing — the BLOCK-SEQUENTIAL container
    * dimension: no index anywhere (m7's ZIP reads a footer directory;
    * m4/m5/m6 follow forward-chained markers/IFDs/boxes) — a tar
    * reader must WALK, parsing each 512-byte header, decoding the
    * OCTAL-ASCII size field, and seeking past ⌈size/512⌉ data blocks
    * to the next header, until two zero blocks terminate. Every header
    * is verified for real: the `ustar` magic at offset 257 and the
    * POSIX checksum (byte sum with the checksum field read as spaces).
    * Damage (truncation, bad magic, wrong checksum, non-octal size,
    * single trailing zero block) fails clean to zeros. */
  object TarCodec {
    private def octal(v: Long, width: Int): Array[Byte] = {
      val s = java.lang.Long.toOctalString(v)
      val pad = "0" * (width - 1 - s.length) + s
      (pad + " ").getBytes("US-ASCII")
    }

    private def parseOctal(b: Array[Byte], o: Int, w: Int): Long = {
      var v = 0L
      var k = o
      while (k < o + w && b(k) != 0 && b(k) != ' ') {
        val c = b(k) - '0'
        if (c < 0 || c > 7) return -1L
        v = v * 8 + c
        k += 1
      }
      v
    }

    /** n regular members named member<i>.bin with the given sizes;
      * content bytes derived from `seed` (deterministic). */
    def buildTar(sizes: Seq[Int], seed: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      sizes.zipWithIndex.foreach { case (sz, i) =>
        val hdr = new Array[Byte](512)
        val name = s"member$i.bin".getBytes("US-ASCII")
        System.arraycopy(name, 0, hdr, 0, name.length)
        System.arraycopy(octal(420, 8), 0, hdr, 100, 8) // mode 0644
        System.arraycopy(octal(0, 8), 0, hdr, 108, 8)
        System.arraycopy(octal(0, 8), 0, hdr, 116, 8)
        System.arraycopy(octal(sz.toLong, 12), 0, hdr, 124, 12)
        System.arraycopy(octal(seed % 1700000000L, 12), 0, hdr, 136, 12)
        java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
        hdr(156) = '0' // typeflag: regular file
        System.arraycopy("ustar ".getBytes("US-ASCII"), 0, hdr, 257, 6)
        System.arraycopy("00".getBytes("US-ASCII"), 0, hdr, 263, 2)
        var sum = 0L
        var k = 0
        while (k < 512) { sum += hdr(k) & 0xff; k += 1 }
        System.arraycopy(octal(sum, 7), 0, hdr, 148, 7) // 6 digits + NUL
        hdr(155) = ' '
        out.write(hdr)
        out.write(Array.tabulate[Byte](sz)(j => ((seed + i + j) % 251).toByte))
        out.write(new Array[Byte]((512 - sz % 512) % 512))
      }
      out.write(new Array[Byte](1024))
      out.toByteArray
    }

    /** Block-sequential walk with per-header magic + checksum
      * verification and octal size decoding. */
    def decodeTar(r: MediaRow): TarFeatures = {
      val p = r.payload
      def fail = TarFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0L, 0L)
      def isZeroBlock(o: Int): Boolean = {
        var k = o
        while (k < o + 512) { if (p(k) != 0) return false; k += 1 }
        true
      }
      var off = 0
      var n = 0
      var total = 0L
      var blocks = 0L
      while (true) {
        if (off + 512 > p.length) return fail
        if (isZeroBlock(off)) {
          return if (off + 1024 <= p.length && isZeroBlock(off + 512))
            TarFeatures(r.doc_id, "tar", p.length.toLong, n, total, blocks)
          else fail
        }
        if (!(p(off + 257) == 'u' && p(off + 258) == 's' &&
            p(off + 259) == 't' && p(off + 260) == 'a' &&
            p(off + 261) == 'r')) return fail
        var sum = 0L
        var k = 0
        while (k < 512) {
          sum += (if (k >= 148 && k < 156) ' '.toInt else p(off + k) & 0xff)
          k += 1
        }
        if (parseOctal(p, off + 148, 8) != sum) return fail
        val sz = parseOctal(p, off + 124, 12)
        if (sz < 0) return fail
        val db = (sz + 511) / 512
        // Seek in Long space: a crafted 12-digit octal size (up to
        // ~6.8e10) would overflow `db.toInt * 512` and drive off
        // negative — fail clean on any size that seeks past the end
        // instead of indexing out of bounds.
        val nextOff = off.toLong + 512L + db * 512L
        if (nextOff > p.length) return fail
        n += 1
        total += sz
        blocks += db
        off = nextOff.toInt
      }
      fail // unreachable
    }
  }

  object JpegCodec {
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def rdBe16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    private val M = 0xff.toByte

    /** SOI + APP0(JFIF) [+ DQT] + SOF0(3-component) + SOS + entropy
      * body + EOI. Segment lengths are real (include their own 2 length
      * bytes, exclude the marker). */
    def buildJpeg(width: Int, height: Int, withDqt: Boolean,
        body: Array[Byte]): Array[Byte] = {
      val app0 = Array[Byte](M, 0xe0.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
        be16(72) ++ be16(72) ++ Array[Byte](0, 0)
      val dqt =
        if (!withDqt) Array.emptyByteArray
        else Array[Byte](M, 0xdb.toByte) ++ be16(67) ++ Array[Byte](0) ++
          Array.tabulate[Byte](64)(i => ((i % 63) + 1).toByte)
      val sof0 = Array[Byte](M, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(height) ++ be16(width) ++ Array[Byte](3) ++
        Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      val sos = Array[Byte](M, 0xda.toByte) ++ be16(12) ++ Array[Byte](3) ++
        Array[Byte](1, 0, 2, 0x11, 3, 0x11) ++ Array[Byte](0, 63, 0)
      Array[Byte](M, 0xd8.toByte) ++ app0 ++ dqt ++ sof0 ++ sos ++ body ++
        Array[Byte](M, 0xd9.toByte)
    }

    def isJpeg(p: Array[Byte]): Boolean =
      p.length >= 4 && p(0) == M && p(1) == 0xd8.toByte && p(2) == M

    /** Walk the marker chain: collect SOF0–SOF3 dimensions and count
      * segments until SOS (or a structural error → zeros). */
    def decodeJpeg(r: MediaRow): JpegFeatures = {
      val p = r.payload
      if (!isJpeg(p))
        return JpegFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0, 0)
      var i = 2
      var w = 0; var h = 0; var nSeg = 0
      var done = false; var ok = true
      while (!done && ok) {
        if (i + 4 > p.length || p(i) != M) { ok = false }
        else {
          val marker = p(i + 1) & 0xff
          if (marker == 0xda) done = true // SOS: entropy data follows
          else {
            val len = rdBe16(p, i + 2)
            if (len < 2 || i + 2 + len > p.length) ok = false
            else {
              if (marker >= 0xc0 && marker <= 0xc3) {
                h = rdBe16(p, i + 5); w = rdBe16(p, i + 7)
              }
              nSeg += 1
              i += 2 + len
            }
          }
        }
      }
      if (!ok) JpegFeatures(r.doc_id, "unknown", p.length.toLong, 0, 0, 0)
      else JpegFeatures(r.doc_id, "jpeg", p.length.toLong, w, h, nSeg)
    }
  }

  /** Parsed GIF metadata (see [[GifCodec]]). */
  final case class GifFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, gct_entries: Int, n_frames: Int,
      n_exts: Int, n_subblocks: Long, data_bytes: Long)

  /** GIF87a/89a parsing — the LENGTH-PREFIXED SUB-BLOCK CHAIN
    * dimension none of m4–m8 exercise: ZIP reads a footer directory,
    * TAR seeks fixed 512-byte blocks, MP4/TIFF/JPEG follow sized or
    * forward-chained markers — a GIF reader must walk chains of
    * 1-byte-length-prefixed data sub-blocks (pixel data and every
    * extension payload) until a 0x00 terminator, with no total length
    * recorded anywhere. Header + logical screen descriptor + global
    * color table are verified/consumed for real; block dispatch is on
    * the introducer byte (0x21 extension → label + chain, 0x2C image
    * descriptor → 9-byte geometry + optional local table + LZW
    * min-code byte + chain, 0x3B trailer terminates — and must land
    * exactly at end-of-payload). Damage (truncation mid-chain, junk
    * introducer, missing trailer, short screen descriptor) fails clean
    * to zeros. */
  object GifCodec {
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def rdLe16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    /** `nFrames` images of sub-block-chained pseudo-pixel data (sizes
      * from `frameBytes`), a graphic-control extension, optionally one
      * comment extension of `commentLen` bytes, and a global color
      * table of 2^(gctExp+1) entries. Deterministic bytes from the
      * sizes only. */
    def buildGif(v89: Boolean, width: Int, height: Int, gctExp: Int,
        frameBytes: Seq[Int], withComment: Boolean,
        commentLen: Int): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= (if (v89) "GIF89a" else "GIF87a").getBytes("US-ASCII")
      out ++= le16(width); out ++= le16(height)
      out += (0x80 | gctExp).toByte // GCT flag + size exponent
      out += 0; out += 0            // background index, aspect
      val entries = 1 << (gctExp + 1)
      (0 until 3 * entries).foreach(i => out += (i % 251).toByte)
      // graphic-control extension: label 0xF9, one 4-byte sub-block
      out += 0x21; out += 0xf9.toByte; out += 4
      out ++= Array[Byte](0, 0, 0, 0); out += 0
      if (withComment) {
        out += 0x21; out += 0xfe.toByte; out += commentLen.toByte
        (0 until commentLen).foreach(i => out += ('a' + i % 26).toByte)
        out += 0
      }
      frameBytes.zipWithIndex.foreach { case (df, f) =>
        out += 0x2c
        out ++= le16(f); out ++= le16(f)         // left, top
        out ++= le16(width); out ++= le16(height)
        out += 0                                  // no local color table
        out += 8                                  // LZW min code size
        var left = df
        while (left > 0) {
          val n = math.min(255, left)
          out += n.toByte
          (0 until n).foreach(i => out += ((df + i) % 253).toByte)
          left -= n
        }
        out += 0 // chain terminator
      }
      out += 0x3b.toByte
      out.toArray
    }

    def decodeGif(r: MediaRow): GifFeatures = {
      val p = r.payload
      def fail = GifFeatures(r.doc_id, "unknown", p.length.toLong,
        0, 0, 0, 0, 0, 0L, 0L)
      if (p.length < 14) return fail
      val hdr = new String(p, 0, 6, "US-ASCII")
      if (hdr != "GIF87a" && hdr != "GIF89a") return fail
      val w = rdLe16(p, 6); val h = rdLe16(p, 8)
      val packed = p(10) & 0xff
      val entries = if ((packed & 0x80) != 0) 1 << ((packed & 0x07) + 1)
        else 0
      var i = 13 + 3 * entries
      var frames = 0; var exts = 0; var subs = 0L; var data = 0L
      // a sub-block chain: length-prefixed blocks to the 0 terminator;
      // only image-data chains count toward subs/data
      def chain(start: Int, tally: Boolean): Int = {
        var j = start
        while (j < p.length && p(j) != 0) {
          val n = p(j) & 0xff
          if (j + 1 + n > p.length) return -1
          if (tally) { subs += 1; data += n }
          j += 1 + n
        }
        if (j >= p.length) -1 else j + 1
      }
      while (i < p.length) {
        (p(i) & 0xff) match {
          case 0x21 =>
            if (i + 2 >= p.length) return fail
            exts += 1
            i = chain(i + 2, tally = false)
            if (i < 0) return fail
          case 0x2c =>
            if (i + 11 > p.length) return fail
            val lctPacked = p(i + 9) & 0xff
            val lct = if ((lctPacked & 0x80) != 0)
              3 * (1 << ((lctPacked & 0x07) + 1)) else 0
            frames += 1
            i = chain(i + 10 + lct + 1, tally = true)
            if (i < 0) return fail
          case 0x3b =>
            // trailer must be the LAST byte — trailing junk fails
            return if (i == p.length - 1)
              GifFeatures(r.doc_id, if (hdr == "GIF89a") "gif89" else "gif87",
                p.length.toLong, w, h, entries, frames, exts, subs, data)
            else fail
          case _ => return fail
        }
      }
      fail // ran off the end without a trailer
    }
  }

  /** Parsed FLAC metadata (see [[FlacCodec]]). */
  final case class FlacFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      total_samples: Long, duration_ms: Long, n_blocks: Int,
      padding_bytes: Long, frame_bytes: Long)

  /** FLAC container parsing — the BIT-PACKED FIELD dimension none of
    * m1–m9 exercise: every other codec reads byte-aligned integers
    * (LE/BE 16/24/32), but STREAMINFO packs sample rate (20 bits),
    * channels−1 (3 bits), bits-per-sample−1 (5 bits) and total
    * samples (36 bits) across unaligned byte boundaries, so the
    * reader must shift/mask through bytes that each carry parts of
    * two fields. Block walk: "fLaC" magic, then metadata blocks of
    * 1-byte header (bit 7 = last-block flag, bits 0–6 = type) +
    * 24-bit BE length + payload — the FIRST block must be STREAMINFO
    * (type 0, length 34, spec-mandated); the walk ends when the
    * last-block flag fires (no trailer byte exists — the complement
    * of GIF's land-exactly-on-trailer rule) and everything after is
    * opaque audio frames. Damage (bad magic, wrong first block type,
    * truncation mid-block, length overrunning the payload, a walk
    * that never fires the last flag) fails clean to zeros. */
  object FlacCodec {
    private def be24(v: Int): Array[Byte] =
      Array(((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        (v & 0xff).toByte)
    private def rdBe24(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)

    /** STREAMINFO + optional VORBIS_COMMENT (vendor of `vendorLen`
      * bytes) + optional PADDING (`padLen` bytes, 0 legal) + `frameLen`
      * opaque frame bytes. Deterministic bytes from the sizes only. */
    def buildFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
        totalSamples: Long, vendorLen: Int, withPadding: Boolean,
        padLen: Int, frameLen: Int): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= "fLaC".getBytes("US-ASCII")
      val hasVc = vendorLen > 0
      // STREAMINFO: last-block iff nothing follows but frames
      out += (if (!hasVc && !withPadding) 0x80 else 0x00).toByte
      out ++= be24(34)
      out ++= Array(0x10, 0x00, 0x10, 0x00).map(_.toByte) // min/max blocksize 4096
      out ++= be24(0); out ++= be24(0)                    // min/max framesize (unknown)
      // 64 bit-packed bits: sr(20) | ch-1(3) | bps-1(5) | samples(36)
      val ch = channels - 1; val bps = bitsPerSample - 1
      out += ((sampleRate >> 12) & 0xff).toByte
      out += ((sampleRate >> 4) & 0xff).toByte
      out += (((sampleRate & 0xf) << 4) | (ch << 1) | (bps >> 4)).toByte
      out += (((bps & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
      out += ((totalSamples >> 24) & 0xff).toByte
      out += ((totalSamples >> 16) & 0xff).toByte
      out += ((totalSamples >> 8) & 0xff).toByte
      out += (totalSamples & 0xff).toByte
      (0 until 16).foreach(i => out += (i * 17 % 251).toByte) // fake md5
      if (hasVc) {
        out += (if (!withPadding) 0x84 else 0x04).toByte // type 4
        out ++= be24(4 + vendorLen + 4)
        // vendor_length is LITTLE-endian inside the vorbis payload
        out += (vendorLen & 0xff).toByte
        out += ((vendorLen >> 8) & 0xff).toByte; out += 0; out += 0
        (0 until vendorLen).foreach(i => out += ('a' + i % 26).toByte)
        out ++= Array[Byte](0, 0, 0, 0) // zero user comments
      }
      if (withPadding) {
        out += 0x81.toByte // type 1, last
        out ++= be24(padLen)
        (0 until padLen).foreach(_ => out += 0)
      }
      (0 until frameLen).foreach(i => out += ((i * 7 + 1) % 251).toByte)
      out.toArray
    }

    def decodeFlac(r: MediaRow): FlacFeatures = {
      val p = r.payload
      def fail = FlacFeatures(r.doc_id, "unknown", p.length.toLong,
        0, 0, 0, 0L, 0L, 0, 0L, 0L)
      if (p.length < 8) return fail
      if (new String(p, 0, 4, "US-ASCII") != "fLaC") return fail
      var off = 4
      var last = false
      var n = 0
      var sr = 0; var ch = 0; var bps = 0; var ts = 0L; var pad = 0L
      while (!last) {
        if (off + 4 > p.length) return fail
        val hdr = p(off) & 0xff
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7f
        val len = rdBe24(p, off + 1)
        if (off + 4 + len > p.length) return fail
        if (n == 0) {
          // spec: first block MUST be STREAMINFO, exactly 34 bytes
          if (typ != 0 || len != 34) return fail
          val b = off + 4
          sr = ((p(b + 10) & 0xff) << 12) | ((p(b + 11) & 0xff) << 4) |
            ((p(b + 12) & 0xff) >> 4)
          ch = ((p(b + 12) >> 1) & 0x7) + 1
          bps = (((p(b + 12) & 0x1) << 4) | ((p(b + 13) & 0xff) >> 4)) + 1
          ts = ((p(b + 13) & 0xfL) << 32) | ((p(b + 14) & 0xffL) << 24) |
            ((p(b + 15) & 0xffL) << 16) | ((p(b + 16) & 0xffL) << 8) |
            (p(b + 17) & 0xffL)
        } else if (typ == 0) return fail // duplicate STREAMINFO
        else if (typ == 1) pad += len
        n += 1
        off += 4 + len
      }
      if (sr <= 0) return fail // spec: 0 sample rate is invalid
      FlacFeatures(r.doc_id, "flac", p.length.toLong, sr, ch, bps, ts,
        ts * 1000L / sr, n, pad, (p.length - off).toLong)
    }
  }

  /** Parsed PDF metadata (see [[PdfCodec]]). */
  final case class PdfFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      n_objects: Int, xref_offset: Long, stream_bytes: Long,
      n_verified: Int, size_entry: Int)

  /** Classic-xref PDF parsing — the TEXT-ENCODED OFFSET TABLE
    * dimension none of m1–m10 exercise: every other codec's offsets
    * are binary integers, but a PDF xref is an ASCII table of
    * fixed-width 20-byte records (10-digit zero-padded decimal offset,
    * 5-digit generation, in-use flag) reached by scanning BACKWARD
    * from end-of-file for the `startxref` keyword and parsing the
    * decimal offset on the next line — ZIP's EOCD walk re-expressed in
    * text. Each in-use entry's offset is then dereferenced and the
    * object header (`N 0 obj`) cross-checked — the LFH-style
    * verification, text-encoded — and each object's `/Length` value
    * is parsed from its dictionary. The trailer's `/Size` must equal
    * the subsection count and the payload must end at `%%EOF`.
    * Damage (bad magic, corrupt startxref number, xref offset out of
    * range, a flipped digit in an entry offset, truncation, /Size
    * mismatch) fails clean to zeros. */
  object PdfCodec {
    /** `n` stream objects, object i carrying `lenBase + i` stream
      * bytes; classic xref + trailer + startxref + %%EOF. */
    def buildPdf(n: Int, lenBase: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      w("%PDF-1.4\n")
      val offs = new Array[Long](n + 1)
      for (i <- 1 to n) {
        offs(i) = out.size().toLong
        val L = lenBase + i
        w(s"$i 0 obj\n<</Length $L>>\nstream\n")
        val data = Array.tabulate[Byte](L)(j => (('a' + (i + j) % 26)).toByte)
        out.write(data)
        w("\nendstream\nendobj\n")
      }
      val xoff = out.size().toLong
      w("xref\n")
      w(s"0 ${n + 1}\n")
      w("0000000000 65535 f\r\n")
      for (i <- 1 to n) w(f"${offs(i)}%010d 00000 n\r\n")
      w(s"trailer\n<</Size ${n + 1}/Root 1 0 R>>\n")
      w(s"startxref\n$xoff\n%%EOF")
      out.toByteArray
    }

    def decodePdf(r: MediaRow): PdfFeatures = {
      val p = r.payload
      def fail = PdfFeatures(r.doc_id, "unknown", p.length.toLong,
        0, 0L, 0L, 0, 0)
      def ascii(o: Int, n: Int): String =
        if (o < 0 || o + n > p.length) "" else new String(p, o, n, "US-ASCII")
      if (!ascii(0, 5).equals("%PDF-")) return fail
      if (p.length < 20 || !ascii(p.length - 5, 5).equals("%%EOF")) return fail
      // backward keyword scan (the EOCD analog, ASCII)
      val key = "startxref".getBytes("US-ASCII")
      var k = p.length - key.length
      var found = -1
      while (found < 0 && k >= 0) {
        var j = 0
        while (j < key.length && p(k + j) == key(j)) j += 1
        if (j == key.length) found = k else k -= 1
      }
      if (found < 0) return fail
      // decimal integer on the following line
      def parseInt(from: Int): (Long, Int) = { // (value, posAfter); -1 on junk
        var i = from
        var v = 0L
        var any = false
        while (i < p.length && p(i) >= '0' && p(i) <= '9') {
          v = v * 10 + (p(i) - '0'); i += 1; any = true
        }
        (if (any) v else -1L, i)
      }
      if (found + key.length >= p.length || p(found + key.length) != '\n')
        return fail
      val (xoff, _) = parseInt(found + key.length + 1)
      if (xoff < 0 || xoff + 5 > p.length) return fail
      if (!ascii(xoff.toInt, 5).equals("xref\n")) return fail
      var pos = xoff.toInt + 5
      if (pos + 2 > p.length || p(pos) != '0' || p(pos + 1) != ' ')
        return fail
      val (m, afterM) = parseInt(pos + 2)
      if (m < 1 || afterM >= p.length || p(afterM) != '\n') return fail
      pos = afterM + 1
      if (pos + 20L * m > p.length) return fail
      var verified = 0
      var streams = 0L
      var obj = 1
      while (obj < m) { // entry 0 is the free head; objects are 1..m-1
        val e = pos + 20 * obj
        val (off, afterOff) = parseInt(e)
        if (afterOff != e + 10 || p(e + 10) != ' ' || p(e + 16) != ' ')
          return fail
        if (p(e + 17) != 'n') return fail
        val hdr = s"$obj 0 obj\n<</Length "
        if (ascii(off.toInt, hdr.length).equals(hdr)) {
          val (len, afterLen) = parseInt(off.toInt + hdr.length)
          if (len >= 0 && ascii(afterLen, 2).equals(">>")) {
            verified += 1
            streams += len
          } else return fail
        } else return fail
        obj += 1
      }
      pos += 20 * m.toInt
      if (!ascii(pos, 7).equals("trailer")) return fail
      // /Size inside the trailer dict
      val tail = ascii(pos, math.min(128, p.length - pos))
      val si = tail.indexOf("/Size ")
      if (si < 0) return fail
      val (size, _) = parseInt(pos + si + 6)
      if (size != m) return fail // Size must equal the subsection count
      PdfFeatures(r.doc_id, "pdf", p.length.toLong, (m - 1).toInt, xoff,
        streams, verified, size.toInt)
    }
  }
}
