package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder mandate; SURVEY.md §2.5 C4 family):
  * image/audio/video travel as opaque `binary` columns with typed
  * metadata, processed by iterator-based `mapPartitions` stages so one
  * task streams through its partition without materializing it — the
  * distributed shape a real decoder plugs into.
  *
  * The decode boundary is REAL for JDK-decodable formats: PPM (P6) and
  * WAV (PCM s16le) parse header+payload with plain byte arithmetic, PNG
  * (8-bit RGB/grayscale) decodes through `java.util.zip.Inflater`, and
  * JPEG/GIF/BMP — JPEG being the most common image format a real corpus
  * carries — through the JDK's own `javax.imageio` readers
  * (java.desktop module); none of these needs an external codec library
  * ([[decodePpm]]/[[decodeWav]]/[[decodePng]]/[[decodeJpeg]]/
  * [[decodeGif]]/[[decodeBmp]] — checked against checked-in fixture
  * files end-to-end through `binaryFile` ingest). STUB BOUNDARY: only
  * codecs absent from both the container and the JDK (MP3/H.264) fall
  * back to `decodeStub`'s deterministic fake features; swapping the
  * stub for a JNI/codec call is a one-function change and every
  * Spark-side shape stays identical.
  */
object Multimodal {

  case class AssetMeta(width: Int, height: Int, format: String)
  case class Asset(asset_id: Long, kind: String, content: Array[Byte],
                   meta: AssetMeta)
  case class AssetFeatures(asset_id: Long, kind: String, dim: Int,
                           features: Array[Float])

  /** Build a deterministic asset table from `documents` (text bytes stand
    * in for media payloads; kind cycles image/audio/video). */
  def toAssets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          (length(col("text")) % 640).cast("int").as("width"),
          (length(col("text")) % 480).cast("int").as("height"),
          lit("stub").as("format")).as("meta"))
      .as[Asset]
  }

  // ---- real decode: codec-free formats -------------------------------
  // PPM (P6) and WAV (PCM s16le) are header+raw-payload formats parseable
  // with plain byte arithmetic, so the decode boundary is REAL for them —
  // the stub below now covers only compressed codecs (JPEG/MP3/H.264),
  // whose libraries are absent from this container.

  /** PPM P6 header parse: `(meta, payload offset, maxval)`. Header =
    * "P6", then whitespace-separated width, height, maxval ('#' comments
    * skipped per spec), one whitespace byte, then raw RGB triplets.
    * None when the payload isn't a well-formed, COMPLETE P6 — every
    * header field is untrusted input, so dimensions are range-checked
    * and the pixel-count arithmetic runs in Long (an Int w·h·3 wraps for
    * hostile dimensions, defeating the length guard and crashing where
    * the contract is None → stub fallback). Header-only on purpose:
    * [[parseMeta]] must not pay a per-pixel pass for metadata. */
  private[operators] def ppmHeader(
      b: Array[Byte]): Option[(AssetMeta, Int, Int)] = {
    if (b.length < 11 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
        else if (b(i).toChar.isWhitespace) i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0L; var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9' &&
        v <= (1 << 24)) {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (any && v <= (1 << 24)) v.toInt else -1
    }
    val (w, h, maxv) = (int(), int(), int())
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    i += 1 // the single whitespace byte after maxval
    if (b.length.toLong - i < w.toLong * h * 3) return None
    Some((AssetMeta(w, h, "ppm"), i, maxv))
  }

  /** PPM P6 full decode: `(meta, per-pixel luminance in [-1, 1])`. */
  private[operators] def decodePpm(
      b: Array[Byte]): Option[(AssetMeta, Array[Float])] =
    ppmHeader(b).map { case (meta, off, maxv) =>
      val (w, h) = (meta.width, meta.height)
      val lum = new Array[Float](w * h)
      var p = 0
      while (p < w * h) {
        val o = off + p * 3
        val s = (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
        lum(p) = s / (3.0f * maxv) * 2.0f - 1.0f
        p += 1
      }
      (meta, lum)
    }

  /** WAV RIFF header parse, PCM 16-bit little-endian: `(meta(n_samples,
    * channels, "wav"), data offset, data length)`. Walks the chunk list
    * (fmt may precede data with LIST/fact chunks between). None for
    * non-RIFF payloads or non-PCM16 encodings — and the chunk SIZE
    * field is untrusted input: the cursor advance runs in Long and must
    * strictly grow, so a hostile size (0xFFFFFFF8 would advance by 0;
    * 0x7FFFFFF0 would wrap an Int cursor negative) ends the walk as a
    * malformed payload instead of hanging the task or throwing.
    * Header-only: no per-sample work ([[parseMeta]]'s path). */
  private[operators] def wavHeader(
      b: Array[Byte]): Option[(AssetMeta, Int, Int)] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int) = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var (channels, bits, fmt) = (0, 0, 0)
    var i = 12L
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (fmt == 0 || data.isEmpty)) {
      val io = i.toInt
      val (id, size) = (tag(io), u32(io + 4)) // size: unsigned, as Long
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmt = u16(io + 8); channels = u16(io + 10); bits = u16(io + 22)
      } else if (id == "data")
        data = Some((io + 8, math.min(size, b.length - i - 8).toInt))
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    // an EMPTY data chunk is a legal zero-sample file (decodes to no
    // samples), not a malformed payload; len can no longer be negative
    // (size is unsigned and clamped to the remaining bytes)
    if (fmt != 1 || bits != 16 || channels < 1 || data.isEmpty) return None
    val (off, len) = data.get
    val n = len / 2
    Some((AssetMeta(n / channels, channels, "wav"), off, len))
  }

  /** WAV full decode: `(meta, interleaved samples in [-1, 1))`. */
  private[operators] def decodeWav(
      b: Array[Byte]): Option[(AssetMeta, Array[Float])] =
    wavHeader(b).map { case (meta, off, len) =>
      val n = len / 2
      val out = new Array[Float](n)
      var s = 0
      while (s < n) {
        val v = ((b(off + 2 * s) & 0xff) |
          (b(off + 2 * s + 1) << 8)).toShort
        out(s) = v / 32768.0f
        s += 1
      }
      (meta, out)
    }

  /** MP3 frame-header walk (MPEG-1 Layer III, the overwhelmingly common
    * profile): `meta(samplesPerChannel, channels, "mp3")` — the WAV
    * convention for audio (width = samples per channel, so duration =
    * width / sampleRate). Skips a leading ID3v2 tag (syncsafe size),
    * then walks 0xFFEx sync'd frames, deriving each frame's byte length
    * from its own bitrate/samplerate fields (144·bitrate/rate +
    * padding) and counting 1152 samples per frame. REQUIRES ≥ 2
    * consecutive valid frames — a lone sync word inside random bytes is
    * a false positive, not an MP3. Every header field is untrusted:
    * free-format (bitrate idx 0) and bad (15) indexes, reserved
    * version/layer bits, and a frame length overrunning the payload all
    * end the walk; a walk that never strictly advances cannot loop.
    * Header-only — O(frames), never touches coefficient data
    * ([[parseMeta]]'s path; full PCM decode needs a synthesis
    * filterbank, the documented codec stub boundary below). */
  private[operators] def mp3Header(b: Array[Byte]): Option[AssetMeta] = {
    // MPEG-1 Layer III bitrates (kbps) and sample rates by table index
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320, -1)
    val rates = Array(44100, 48000, 32000, -1)
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2: 10-byte header + syncsafe (7-bit-per-byte) payload size
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + sz
      if (i < 0 || i >= b.length) return None
    }
    var frames = 0
    var channels = 0
    var ok = true
    while (ok && i + 4 <= b.length) {
      val h1 = b(i) & 0xff; val h2 = b(i + 1) & 0xff
      val h3 = b(i + 2) & 0xff; val h4 = b(i + 3) & 0xff
      // sync (11 bits) + version 11 (MPEG-1) + layer 01 (III)
      if (h1 != 0xff || (h2 & 0xfe) != 0xfa) ok = false
      else {
        val br = kbps((h3 >> 4) & 0xf); val sr = rates((h3 >> 2) & 0x3)
        if (br <= 0 || sr <= 0) ok = false
        else {
          val pad = (h3 >> 1) & 1
          val flen = 144 * br * 1000 / sr + pad
          if (flen <= 4 || i + flen > b.length) ok = false
          else {
            frames += 1
            channels = if (((h4 >> 6) & 0x3) == 3) 1 else 2
            i += flen
          }
        }
      }
    }
    // must consume the WHOLE payload (a trailing 128-byte ID3v1 "TAG"
    // block is the one legal tail) — best-effort prefix parses over
    // arbitrary binary would turn random data into fake audio metadata
    val cleanEnd = i == b.length ||
      (b.length - i == 128 && b(i) == 'T' && b(i + 1) == 'A' &&
        b(i + 2) == 'G')
    if (frames >= 2 && cleanEnd)
      Some(AssetMeta(frames * 1152, channels, "mp3"))
    else None
  }

  /** H.264 (Annex B) SPS parse: `meta(width, height, "h264")` from the
    * first sequence-parameter-set NAL. Finds the 00 00 01 start code,
    * strips emulation-prevention bytes (00 00 03 → 00 00), then reads
    * the SPS with an exp-Golomb bit reader: profile/level, the
    * high-profile chroma/scaling-list branch (skipped list-by-list per
    * spec), pic-order-cnt branches, then width/height in macroblocks
    * and the frame-cropping rectangle (crop units follow 4:2:0 /
    * chroma_format_idc). Every field is untrusted: ue() values are
    * capped, the bit reader returns None at end-of-data instead of
    * throwing, and dimensions are range-checked (≤ 2²⁴ pixels).
    * Header-only — the entropy-coded slice data is never touched (full
    * pixel decode = CABAC + motion compensation, the documented codec
    * stub boundary below). */
  private[operators] def h264Header(b: Array[Byte]): Option[AssetMeta] = {
    // locate an SPS NAL (type 7) after a 00 00 01 start code
    var s = -1
    var i = 0
    while (s < 0 && i + 3 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 &&
        (b(i + 3) & 0x1f) == 7) s = i + 4
      else i += 1
    }
    if (s < 0) return None
    // NAL payload to next start code, emulation-prevention stripped
    var e = s
    while (e + 2 < b.length &&
      !(b(e) == 0 && b(e + 1) == 0 && b(e + 2) <= 1)) e += 1
    if (e + 2 >= b.length) e = b.length
    val rbsp = new java.io.ByteArrayOutputStream()
    var z = 0
    var j = s
    while (j < e) {
      val v = b(j) & 0xff
      if (!(z >= 2 && v == 3)) rbsp.write(v)
      z = if (v == 0) z + 1 else 0
      j += 1
    }
    val r = rbsp.toByteArray
    var bit = 0
    def u(n: Int): Option[Int] = {
      if (bit + n > r.length * 8) None
      else {
        var v = 0
        var k = 0
        while (k < n) {
          v = (v << 1) | ((r(bit >> 3) >> (7 - (bit & 7))) & 1)
          bit += 1; k += 1
        }
        Some(v)
      }
    }
    def ue(): Option[Int] = {
      var zeros = 0
      while (bit < r.length * 8 &&
        ((r(bit >> 3) >> (7 - (bit & 7))) & 1) == 0 && zeros <= 24) {
        zeros += 1; bit += 1
      }
      if (zeros > 24 || bit >= r.length * 8) None
      else u(zeros + 1).map(_ - 1)
    }
    def se(): Option[Int] = ue().map(k =>
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2)
    def skipScalingList(size: Int): Boolean = {
      var (last, next, ok, idx) = (8, 8, true, 0)
      while (ok && idx < size && next != 0) {
        se() match {
          case Some(d) => next = (last + d + 256) % 256
            if (next != 0) last = next
          case None => ok = false
        }
        idx += 1
      }
      ok
    }
    val parsed = for {
      profile <- u(8)
      _ <- u(8) // constraint flags + reserved
      _ <- u(8) // level_idc
      _ <- ue() // seq_parameter_set_id
      chroma <-
        if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
            134, 135).contains(profile)) {
          for {
            cf <- ue()
            _ <- if (cf == 3) u(1) else Some(0) // separate_colour_plane
            _ <- ue() // bit_depth_luma_minus8
            _ <- ue() // bit_depth_chroma_minus8
            _ <- u(1) // qpprime_y_zero_transform_bypass
            sm <- u(1)
            _ <- if (sm == 1) {
              val n = if (cf != 3) 8 else 12
              var ok = true
              var k = 0
              while (ok && k < n) {
                u(1) match {
                  case Some(1) => ok = skipScalingList(if (k < 6) 16 else 64)
                  case Some(_) => ()
                  case None => ok = false
                }
                k += 1
              }
              if (ok) Some(0) else None
            } else Some(0)
          } yield cf
        } else Some(1) // baseline/main/extended imply 4:2:0
      _ <- ue() // log2_max_frame_num_minus4
      poc <- ue()
      _ <- poc match {
        case 0 => ue()
        case 1 => for {
          _ <- u(1); _ <- se(); _ <- se()
          n <- ue()
          ok <- {
            var k = 0
            var good = n <= 256
            while (good && k < n) { good = se().isDefined; k += 1 }
            if (good) Some(0) else None
          }
        } yield ok
        case _ => Some(0)
      }
      _ <- ue() // max_num_ref_frames
      _ <- u(1) // gaps_in_frame_num_value_allowed
      wMbs <- ue()
      hUnits <- ue()
      frameOnly <- u(1)
      _ <- if (frameOnly == 0) u(1) else Some(0) // mb_adaptive
      _ <- u(1) // direct_8x8_inference
      crop <- u(1)
      offs <- if (crop == 1) for {
        l <- ue(); rr <- ue(); t <- ue(); bo <- ue()
      } yield (l, rr, t, bo)
      else Some((0, 0, 0, 0))
    } yield {
      val (cl, cr, ct, cb) = offs
      val (cux, cuy) = chroma match {
        case 0 => (1, 2 - frameOnly)               // monochrome
        case 2 => (2, 1 * (2 - frameOnly))         // 4:2:2
        case 3 => (1, 1 * (2 - frameOnly))         // 4:4:4
        case _ => (2, 2 * (2 - frameOnly))         // 4:2:0
      }
      val w = (wMbs + 1) * 16 - cux * (cl + cr)
      val h = (2 - frameOnly) * (hUnits + 1) * 16 - cuy * (ct + cb)
      (w, h)
    }
    parsed match {
      case Some((w, h))
        if w > 0 && h > 0 && w.toLong * h <= (1L << 24) =>
        Some(AssetMeta(w, h, "h264"))
      case _ => None
    }
  }

  /** PNG signature + IHDR parse: `(meta(width, height, "png"),
    * bytesPerPixel)`. Supports the JDK-decodable profile: 8-bit depth,
    * color type 0 (grayscale) or 2 (RGB truecolor), compression 0,
    * filter method 0, no interlace — the compressed payload is plain
    * zlib, so [[decodePng]] needs only `java.util.zip.Inflater`.
    * Header-only ([[parseMeta]]'s O(header-bytes) path). Every field is
    * untrusted: dimensions are range-checked (≤ 2²⁴, Long math) before
    * any size arithmetic. */
  private[operators] def pngHeader(
      b: Array[Byte]): Option[(AssetMeta, Int)] = {
    if (b.length < 33) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != (sig(i) & 0xff)) return None; i += 1 }
    def u32(o: Int): Long = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u32(8) != 13L ||
      new String(b, 12, 4, "US-ASCII") != "IHDR") return None
    val (w, h) = (u32(16), u32(20))
    if (w <= 0 || h <= 0 || w > (1L << 24) || h > (1L << 24)) return None
    val (depth, color) = (b(24) & 0xff, b(25) & 0xff)
    if (depth != 8 || (b(26) & 0xff) != 0 || (b(27) & 0xff) != 0 ||
      (b(28) & 0xff) != 0) return None
    val bpp = color match { case 0 => 1; case 2 => 3; case _ => return None }
    Some((AssetMeta(w.toInt, h.toInt, "png"), bpp))
  }

  /** JPEG marker-walk header parse: `(meta(width, height, "jpeg"),
    * componentCount)` from the first SOFn frame header. Header-only —
    * SOF precedes the entropy-coded scan (SOS), so the walk costs
    * O(header bytes), never touches compressed data. Every field is
    * untrusted: segment lengths are bounds-checked against the payload
    * (a lying length ends the parse as malformed, no wrap/hang), and
    * dimensions are capped (JPEG's own ceiling is 65535; total pixels
    * ≤ 2²⁴ so the decoder below cannot be tricked into a giant
    * allocation by a hostile frame header). */
  private[operators] def jpegHeader(
      b: Array[Byte]): Option[(AssetMeta, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    // SOFn = C0..CF minus C4 (DHT), C8 (JPG extension), CC (DAC)
    def isSof(m: Int) =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
    var o = 2
    while (o + 1 < b.length) {
      if ((b(o) & 0xff) != 0xff) return None
      val m = b(o + 1) & 0xff
      if (m == 0xff) { o += 1 }                       // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { o += 2 } // standalone
      else {
        if (o + 4 > b.length) return None
        val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        if (len < 2 || o + 2 + len > b.length) return None
        if (isSof(m)) {
          if (len < 8) return None
          val h = ((b(o + 5) & 0xff) << 8) | (b(o + 6) & 0xff)
          val w = ((b(o + 7) & 0xff) << 8) | (b(o + 8) & 0xff)
          val comps = b(o + 9) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
          return Some((AssetMeta(w, h, "jpeg"), comps))
        }
        if (m == 0xda) return None                    // SOS before any SOF
        o += 2 + len
      }
    }
    None
  }

  /** Shared `javax.imageio` decode tail for compressed image formats
    * the JDK itself can read (JPEG/GIF/BMP — java.desktop ships with
    * the JDK, so like [[decodePng]]'s zlib this needs NO external
    * codec library). A format-specific header parse gates the call:
    * dimensions are validated and capped BEFORE ImageIO allocates the
    * raster, so a hostile header cannot force a giant buffer, and the
    * decoded image's dimensions must equal the header's (a reader that
    * "repaired" a lying header is treated as malformed). Truncated or
    * corrupt payload surfaces as an ImageIO exception or null → None,
    * the same fallback contract as PPM/WAV/PNG. Output is per-pixel
    * luminance in [-1, 1] (the shared convention, so image features
    * stay format-independent). Animated GIFs decode as their FIRST
    * frame (the thumbnail contract). */
  private def imageIoDecode(b: Array[Byte],
                            meta: AssetMeta): Option[(AssetMeta, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null || img.getWidth != meta.width ||
        img.getHeight != meta.height) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val lum = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val s = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / (3.0f * 255f)
            lum(y * w + x) = s * 2.0f - 1.0f
            x += 1
          }
          y += 1
        }
        Some((meta, lum))
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** JPEG full decode: [[jpegHeader]]-gated [[imageIoDecode]]. */
  private[operators] def decodeJpeg(
      b: Array[Byte]): Option[(AssetMeta, Array[Float])] =
    jpegHeader(b).flatMap { case (meta, _) => imageIoDecode(b, meta) }

  /** GIF signature + logical-screen-descriptor parse: 6-byte magic
    * (`GIF87a`/`GIF89a`), then u16-LE canvas width/height. Header-only;
    * dimensions capped like [[jpegHeader]]. */
  private[operators] def gifHeader(b: Array[Byte]): Option[AssetMeta] = {
    if (b.length < 10) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) None
    else Some(AssetMeta(w, h, "gif"))
  }

  /** GIF full decode (first frame): [[gifHeader]]-gated
    * [[imageIoDecode]]. */
  private[operators] def decodeGif(
      b: Array[Byte]): Option[(AssetMeta, Array[Float])] =
    gifHeader(b).flatMap(imageIoDecode(b, _))

  /** BMP signature + DIB-header parse: `BM`, u32-LE DIB header size at
    * offset 14 (≥ 40 = BITMAPINFOHEADER family), i32-LE width/height at
    * 18/22 (negative height = top-down row order; the magnitude is the
    * pixel height, which is what ImageIO reports back). Header-only;
    * dimensions capped like [[jpegHeader]]. */
  private[operators] def bmpHeader(b: Array[Byte]): Option[AssetMeta] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (i32(14) < 40) return None // BITMAPCOREHEADER not supported
    val w = i32(18)
    val h = math.abs(i32(22).toLong)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) None
    else Some(AssetMeta(w, h.toInt, "bmp"))
  }

  /** BMP full decode: [[bmpHeader]]-gated [[imageIoDecode]]. */
  private[operators] def decodeBmp(
      b: Array[Byte]): Option[(AssetMeta, Array[Float])] =
    bmpHeader(b).flatMap(imageIoDecode(b, _))

  /** Paeth predictor (PNG filter type 4): the neighbor (left, above,
    * upper-left) closest to a+b−c, ties resolved left → above →
    * upper-left per spec. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG full decode via JDK zlib — no codec library: walk the chunk
    * list (lengths are untrusted: Long cursor, a chunk that doesn't fit
    * the remaining bytes ends the parse as malformed, so a truncated
    * IDAT or a lying 0xFFFFFFFF length can't wrap or hang), inflate the
    * concatenated IDAT stream with `java.util.zip.Inflater`, unfilter
    * rows (all five filter types), fold to per-pixel luminance in
    * [-1, 1] (the [[decodePpm]] convention, so image features are
    * format-independent).
    *
    * Lying-IHDR guard: the raw size h·(1+w·bpp) must not exceed the
    * deflate expansion bound (1032× the compressed bytes, the zlib
    * worst case) — a hostile header claiming 2²⁴×2²⁴ against a
    * 100-byte IDAT is rejected BEFORE the output buffer is allocated.
    * An inflate that ends short (truncated stream) or long (more real
    * output than the header promised) returns None, matching the WAV
    * hardening standard. */
  private[operators] def decodePng(
      b: Array[Byte]): Option[(AssetMeta, Array[Float])] =
    pngHeader(b).flatMap { case (meta, bpp) =>
      val (w, h) = (meta.width, meta.height)
      def u32(o: Int): Long = ((b(o) & 0xffL) << 24) |
        ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) |
        (b(o + 3) & 0xffL)
      // ---- chunk walk: collect IDAT, require IEND ----------------------
      val idat = new java.io.ByteArrayOutputStream()
      var i = 33L // 8 sig + 12 IHDR framing + 13 IHDR data
      var seenEnd = false
      var bad = false
      while (!seenEnd && !bad) {
        if (i + 8 > b.length) bad = true
        else {
          val io = i.toInt
          val len = u32(io)
          val typ = new String(b, io + 4, 4, "US-ASCII")
          if (len > b.length.toLong - i - 12) bad = true // data+crc must fit
          else {
            if (typ == "IDAT") idat.write(b, io + 8, len.toInt)
            else if (typ == "IEND") seenEnd = true
            i += 12 + len // len >= 0: strictly positive advance
          }
        }
      }
      val comp = idat.toByteArray
      val stride = 1L + w.toLong * bpp
      val expected = h.toLong * stride
      val inflated =
        if (bad || comp.isEmpty ||
          expected > math.max(1L << 20, comp.length * 1032L) ||
          expected > Int.MaxValue) None
        else {
          // ---- inflate -------------------------------------------------
          val raw = new Array[Byte](expected.toInt)
          val inf = new java.util.zip.Inflater()
          inf.setInput(comp)
          try {
            var got = 0
            var stuck = false
            while (got < raw.length && !inf.finished() && !stuck) {
              val n = inf.inflate(raw, got, raw.length - got)
              if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
                stuck = true // truncated/underrun stream
              got += n
            }
            // overlong output = header lied small: reject, don't truncate
            val over = !stuck && got == raw.length && !inf.finished() &&
              inf.inflate(new Array[Byte](1)) > 0
            if (stuck || over || got < raw.length) None else Some(raw)
          } catch {
            case _: java.util.zip.DataFormatException => None
          } finally inf.end()
        }
      // ---- unfilter + luminance ---------------------------------------
      inflated.flatMap { r0 =>
        val rb = w * bpp
        val lum = new Array[Float](w * h)
        val prior = new Array[Int](rb)
        val cur = new Array[Int](rb)
        var r = 0
        var ok = true
        while (ok && r < h) {
          val off = r * stride.toInt
          val ft = r0(off) & 0xff
          if (ft > 4) ok = false
          else {
            var x = 0
            while (x < rb) {
              val v = r0(off + 1 + x) & 0xff
              val a = if (x >= bpp) cur(x - bpp) else 0
              val up = if (r > 0) prior(x) else 0
              val ul = if (x >= bpp && r > 0) prior(x - bpp) else 0
              cur(x) = (ft match {
                case 0 => v
                case 1 => v + a
                case 2 => v + up
                case 3 => v + ((a + up) >> 1)
                case _ => v + paeth(a, up, ul)
              }) & 0xff
              x += 1
            }
            var p = 0
            while (p < w) {
              val o = p * bpp
              val s =
                if (bpp == 3) (cur(o) + cur(o + 1) + cur(o + 2)) / (3.0f * 255f)
                else cur(o) / 255.0f
              lum(r * w + p) = s * 2.0f - 1.0f
              p += 1
            }
            System.arraycopy(cur, 0, prior, 0, rb)
            r += 1
          }
        }
        if (ok) Some((meta, lum)) else None
      }
    }

  /** Mean of each of `dim` contiguous signal segments (the fixed-width
    * feature a variable-length decoded signal folds into). */
  private def segmentMeans(signal: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (signal.isEmpty) return out
    var d = 0
    while (d < dim) {
      val lo = (signal.length.toLong * d / dim).toInt
      val hi = (signal.length.toLong * (d + 1) / dim).toInt
      var (s, j) = (0.0, lo)
      while (j < hi) { s += signal(j); j += 1 }
      out(d) = if (hi > lo) (s / (hi - lo)).toFloat else 0.0f
      d += 1
    }
    out
  }

  /** Dispatch: real parse for self-describing codec-free payloads,
    * deterministic stub otherwise. */
  private def decode(content: Array[Byte], dim: Int): Array[Float] =
    decodePng(content).orElse(decodeJpeg(content))
      .orElse(decodeGif(content)).orElse(decodeBmp(content))
      .orElse(decodePpm(content)).orElse(decodeWav(content))
      .map { case (_, signal) => segmentMeans(signal, dim) }
      .getOrElse(decodeStub(content, dim))

  /** Payload-sniffing metadata repair: fills real (width, height, format)
    * for PPM / (samples-per-channel, channels, format) for WAV payloads;
    * other assets pass through untouched. The step between
    * [[readBinaryDir]] (which knows only file-level facts) and anything
    * that trusts `meta`. HEADER-ONLY parses — a metadata pass over a
    * 100-TB corpus must cost O(header bytes), not a full per-pixel/
    * per-sample decode per asset. Iterator-shaped like every stage. */
  def parseMeta(assets: Dataset[Asset]): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      pngHeader(a.content).map(_._1)
        .orElse(jpegHeader(a.content).map(_._1))
        .orElse(gifHeader(a.content))
        .orElse(bmpHeader(a.content))
        .orElse(ppmHeader(a.content).map(_._1))
        .orElse(wavHeader(a.content).map(_._1))
        .orElse(mp3Header(a.content))
        .orElse(h264Header(a.content)) match {
        case Some(meta) => a.copy(meta = meta)
        case None       => a
      }
    })
  }

  /** DECLARED PERMANENT BOUNDARY (round 12; carried as a stub r9–r11):
    * real PIXEL/PCM decode for the remaining COMPRESSED codecs
    * (MP3/H.264) stays out of scope. The blocker is not code but
    * NORMATIVE CONSTANTS: a spec-exact MPEG-1 audio synthesis
    * filterbank requires ISO 11172-3's tabulated 512-coefficient
    * window (Table 3-B.3 — empirically specified, derivable from no
    * closed form), and H.264 residual decode requires the standard's
    * CABAC context/range tables; with no codec library in the
    * container and no egress to fetch the tables, any "decoder" here
    * would fabricate its constants and silently produce non-conformant
    * signal — worse than an honest stand-in. Their METADATA is real
    * ([[mp3Header]]/[[h264Header]] parse actual frame headers / the
    * SPS, feeding [[parseMeta]]); image payloads take the real
    * [[decodePng]]/[[decodeJpeg]]/[[decodePpm]] paths and WAV audio
    * [[decodeWav]] above. Deterministic stand-in for the signal
    * itself: per-dimension rolling hash over the payload bytes, scaled
    * to [-1, 1] — stable across runs, so every downstream Spark stage
    * (schema, partitioning, batch shape) is tested for real. Swapping
    * in a library decoder in a container that has one touches ONLY
    * this function. */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      val d = i % dim
      out(d) = out(d) * 31.0f + (content(i) & 0xff)
      out(d) = out(d) % 1009.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / 1009.0f * 2.0f - 1.0f; d += 1 }
    out
  }

  /** Feature extraction: one pass per partition, iterator in / iterator
    * out (no per-partition materialization — the contract that lets a
    * real decoder batch onto an accelerator). */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map(a => AssetFeatures(a.asset_id, a.kind, dim,
        decode(a.content, dim)))
    }
  }

  /** Batched feature extraction — the accelerator-friendly shape (the
    * Scala analog of a `mapInPandas` batch UDF): each partition's
    * iterator is consumed in `batchSize` groups, the whole batch is
    * handed to the decode kernel in ONE call (where a real
    * implementation ships it to a GPU/codec in bulk), and results
    * stream out without materializing the partition. Bit-identical to
    * [[extractFeatures]] — batching is an execution shape, not a
    * semantics change (asserted in MultimodalSpec). */
  def extractFeaturesBatched(assets: Dataset[Asset], dim: Int = 16,
                             batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one kernel invocation per batch: a real decoder replaces this
        // loop with a single bulk call over `batch`
        batch.map(a => AssetFeatures(a.asset_id, a.kind, dim,
          decode(a.content, dim)))
      }
    }
  }

  /** Perceptual near-dup for media assets — the bridge between the two
    * mature stacks (round-9 ask #5): decoded SIGNAL features
    * ([[extractFeatures]] — luminance/PCM segment means, so the vector
    * depends on the pixels, not the container bytes) flow into the
    * embedding dedup operator ([[Dedup.embeddingCosine]], sign-bucketed
    * cosine LSH). Re-encoded copies (a PNG and a BMP of the SAME
    * pixels) decode to identical feature vectors → same LSH bucket →
    * cosine 1 → the larger asset_id is condemned, exactly like
    * near-dup text; genuinely different media land in different sign
    * buckets or fail verification and all survive.
    *
    * Bands split the feature vector's odd/even positions (every band
    * sees the whole signal's span, so a crop/shift perturbation
    * degrades both bands equally rather than blinding one). Scale shape
    * is embeddingCosine's: per-band bucket exchange + verified
    * candidate joins, hot buckets star-capped — never all-pairs.
    * Compressed-codec kinds (MP3/H.264) ride the documented
    * deterministic stand-in features, so their "perceptual" equality is
    * byte-level until a real codec lands (the honest boundary at
    * [[decodeStub]]). */
  def nearDupAssets(assets: Dataset[Asset], dim: Int = 16,
                    threshold: Double = 0.99,
                    maxBucketSize: Int = 1000): DataFrame = {
    require(dim >= 2, s"banding needs >= 2 feature dims, got $dim")
    val bands = Seq((1 to dim by 2).toSeq, (2 to dim by 2).toSeq)
    Dedup.embeddingCosine(extractFeatures(assets, dim).toDF(),
      "asset_id", "features", threshold, bands, maxBucketSize)
  }

  /** Frame sampling for `video` assets: every k-th fixed-size chunk of the
    * payload (stand-in for every k-th decoded frame), exploded to one row
    * per sampled frame. */
  def frameSample(assets: Dataset[Asset], frameBytes: Int, every: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video")
      .flatMap { a =>
        a.content.grouped(frameBytes).zipWithIndex
          .collect { case (chunk, idx) if idx % every == 0 =>
            (a.asset_id, idx, chunk) }
      }
      .toDF("asset_id", "frame_idx", "frame")
  }

  /** Offsets of the REAL media units inside a payload — H.264 NAL
    * units (00 00 01 / 00 00 00 01 start codes) for video, MPEG-1
    * Layer III frames (the [[mp3Header]] walk, ID3v2 skipped) for
    * audio; None when the payload carries neither structure. Byte
    * offsets only: O(payload) scan, no decode. */
  private[operators] def unitOffsets(b: Array[Byte]): Option[Seq[Int]] = {
    // H.264 Annex B: every start-code position begins a NAL unit
    val nals = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) {
        nals += (if (i >= 1 && b(i - 1) == 0) i - 1 else i)
        i += 3
      } else i += 1
    }
    if (nals.length >= 2) return Some(nals.toSeq)
    // MP3: reuse the validated frame walk (≥2 consecutive frames)
    if (mp3Header(b).isDefined) {
      var j = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        j = 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
      val frames = scala.collection.mutable.ArrayBuffer[Int]()
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320, -1)
      val rates = Array(44100, 48000, 32000, -1)
      var ok = true
      while (ok && j + 4 <= b.length) {
        val h2 = b(j + 1) & 0xff; val h3 = b(j + 2) & 0xff
        if ((b(j) & 0xff) != 0xff || (h2 & 0xfe) != 0xfa) ok = false
        else {
          val br = kbps((h3 >> 4) & 0xf); val sr = rates((h3 >> 2) & 0x3)
          if (br <= 0 || sr <= 0) ok = false
          else {
            val flen = 144 * br * 1000 / sr + ((h3 >> 1) & 1)
            if (flen <= 4 || j + flen > b.length) ok = false
            else { frames += j; j += flen }
          }
        }
      }
      Some(frames.toSeq)
    } else None
  }

  /** [[frameSample]] at REAL media-unit boundaries: every `every`-th
    * H.264 NAL unit (video) or MP3 frame (audio), one row per sampled
    * unit — the shape a decode stage actually wants (a fixed-byte chunk
    * slices mid-unit and every downstream decoder must re-synchronize).
    * Payloads without a recognized unit structure fall back to
    * [[frameSample]]'s fixed-size chunking with `fallbackBytes`, so the
    * stage is total over mixed corpora. Same iterator-shaped
    * `mapPartitions` contract as every other stage. */
  def unitSample(assets: Dataset[Asset], every: Int,
                 fallbackBytes: Int = 4096): DataFrame = {
    // fail fast on the driver: `k % every` with every = 0 would throw
    // ArithmeticException inside executor tasks on both paths
    require(every >= 1, s"every must be >= 1, got $every")
    require(fallbackBytes >= 1, s"fallbackBytes must be >= 1, got $fallbackBytes")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      unitOffsets(a.content) match {
        case Some(offs) =>
          val bounds = offs :+ a.content.length
          offs.indices.collect {
            case k if k % every == 0 =>
              (a.asset_id, k,
                java.util.Arrays.copyOfRange(a.content, bounds(k),
                  bounds(k + 1)))
          }
        case None =>
          a.content.grouped(fallbackBytes).zipWithIndex
            .collect { case (chunk, idx) if idx % every == 0 =>
              (a.asset_id, idx, chunk) }.toSeq
      }
    }.toDF("asset_id", "unit_idx", "unit")
  }

  /** Metadata-level resize: pure column expressions (no payload touch) —
    * the cheap path a planner should prefer when only metadata is read. */
  def resizeMeta(assets: Dataset[Asset], w: Int, h: Int): DataFrame =
    assets.toDF().withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.format").as("format")))

  /** REAL pixel resize (round 11 — the builder-mandate resize step on
    * actual signal, not metadata): every DECODABLE image payload (PNG/
    * JPEG/GIF/BMP/PPM — the same chain [[extractFeatures]] trusts) is
    * decoded to its luminance grid, AREA-AVERAGED down to (w, h) —
    * each target pixel is the mean of its source rectangle, the
    * anti-aliasing-correct reduction (nearest-neighbor aliases;
    * training thumbnails are downsamples, so area coverage is the
    * right kernel) — and re-encoded as a DETERMINISTIC grayscale PPM
    * P6 payload (gray triples, maxval 255), with meta updated to the
    * true new dimensions. Non-image / undecodable payloads pass
    * through byte-identical (the quarantine-not-crash discipline).
    * Iterator-shaped `mapPartitions` like every codec stage — byte
    * work has no Catalyst expression; partitioning is preserved. */
  def resizePixels(assets: Dataset[Asset], w: Int, h: Int)
      : Dataset[Asset] = {
    require(w >= 1 && h >= 1, "target dimensions must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      decodePng(a.content).orElse(decodeJpeg(a.content))
        .orElse(decodeGif(a.content)).orElse(decodeBmp(a.content))
        .orElse(decodePpm(a.content)) match {
        case Some((m, lum)) if m.width > 0 && m.height > 0 &&
            lum.length == m.width * m.height =>
          val out = new Array[Float](w * h)
          var ty = 0
          while (ty < h) {
            // source rectangle [y0, y1) × [x0, x1) in exact rational
            // bounds; ceil/floor keep every source pixel owned once
            val y0 = ty * m.height / h
            val y1 = math.max(y0 + 1, (ty + 1) * m.height / h)
            var tx = 0
            while (tx < w) {
              val x0 = tx * m.width / w
              val x1 = math.max(x0 + 1, (tx + 1) * m.width / w)
              var s = 0.0; var n = 0
              var sy = y0
              while (sy < y1) {
                var sx = x0
                while (sx < x1) {
                  s += lum(sy * m.width + sx); n += 1; sx += 1
                }
                sy += 1
              }
              out(ty * w + tx) = (s / n).toFloat
              tx += 1
            }
            ty += 1
          }
          // grayscale PPM P6: header + one gray triple per pixel
          val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
          val body = new Array[Byte](header.length + w * h * 3)
          System.arraycopy(header, 0, body, 0, header.length)
          var p = 0
          while (p < w * h) {
            val g = math.max(0, math.min(255,
              math.round((out(p) + 1.0f) / 2.0f * 255.0f)))
            val o = header.length + p * 3
            body(o) = g.toByte; body(o + 1) = g.toByte
            body(o + 2) = g.toByte
            p += 1
          }
          Asset(a.asset_id, a.kind, body, AssetMeta(w, h, "ppm"))
        case _ => a // undecodable: pass through byte-identical
      }
    })
  }

  /** Ingest REAL binary payload files via Spark's `binaryFile` source —
    * the production entry point for media landed as objects (one file =
    * one asset). `pathGlobFilter` prunes by extension BEFORE any read;
    * each row carries (path, modificationTime, length, content). The
    * returned Dataset[Asset] feeds the same extractFeatures /
    * frameSample stages as the synthetic table. */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*", kind: String = "image"): Dataset[Asset] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // stable id from the file name digest (paths are unique)
        expr("cast(conv(substr(md5(path), 1, 15), 16, 10) as bigint)")
          .as("asset_id"),
        lit(kind).as("kind"),
        col("content"),
        struct(lit(0).as("width"), lit(0).as("height"),
          element_at(split(col("path"), "\\."), -1).as("format")).as("meta"))
      .as[Asset]
  }
}
