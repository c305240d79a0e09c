package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal plumbing: binary payload schema, partition-preserving
  * feature extraction (decode stubbed — no codecs in this container),
  * frame sampling, metadata ops. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(60)
  private lazy val assets = Multimodal.toAssets(docs)

  test("assets carry binary content with typed metadata") {
    val schema = assets.toDF().schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val kinds = assets.toDF().select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, typed, and fixed-dim") {
    val f1 = Multimodal.extractFeatures(assets, dim = 16)
    val rows = f1.collect()
    assert(rows.length == 60)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(_.dim == 16))
    // deterministic: second run bit-identical
    val again = Multimodal.extractFeatures(assets, dim = 16).collect()
      .map(r => r.asset_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(again(r.asset_id) == r.features.toSeq))
    // features bounded to [-1, 1]
    assert(rows.forall(_.features.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("extraction preserves partitioning (no repartition/shuffle)") {
    val repart = assets.repartition(7)
    val out = Multimodal.extractFeatures(repart, dim = 8)
    assert(out.rdd.getNumPartitions == 7)
  }

  test("batched extraction is bit-identical to per-row and keeps partitioning") {
    val repart = assets.repartition(5)
    val batched = Multimodal.extractFeaturesBatched(repart, dim = 16,
        batchSize = 7) // deliberately not a divisor of partition sizes
      .collect().map(r => r.asset_id -> r.features.toSeq).toMap
    val perRow = Multimodal.extractFeatures(repart, dim = 16)
      .collect().map(r => r.asset_id -> r.features.toSeq).toMap
    assert(batched == perRow,
      "batching is an execution shape, not a semantics change")
    assert(Multimodal.extractFeaturesBatched(repart, dim = 8)
      .rdd.getNumPartitions == 5)
  }

  test("frame sampling takes every k-th chunk of video payloads only") {
    val frames = Multimodal.frameSample(assets, frameBytes = 32, every = 2)
    val kinds = frames.join(assets.toDF().select(col("asset_id"), col("kind")),
      "asset_id").select("kind").distinct().collect().map(_.getString(0))
    assert(kinds.toSeq == Seq("video"))
    val idxs = frames.select("frame_idx").distinct()
      .collect().map(_.getInt(0))
    assert(idxs.forall(_ % 2 == 0))
    assert(frames.count() > 0)
  }

  test("metadata resize touches no payload bytes") {
    val resized = Multimodal.resizeMeta(assets, 224, 224)
    val m = resized.select("meta.width", "meta.height").distinct().collect()
    assert(m.length == 1 && m.head.getInt(0) == 224 && m.head.getInt(1) == 224)
    val origBytes = assets.toDF().agg(sum(length(col("content")))).first().getLong(0)
    val newBytes = resized.agg(sum(length(col("content")))).first().getLong(0)
    assert(origBytes == newBytes)
  }

  test("binaryFile ingest: real payload files -> assets -> features") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    val payloads = Map("a.img" -> "payload-alpha", "b.img" -> "payload-beta",
      "skip.txt" -> "not-an-image")
    payloads.foreach { case (name, body) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        body.getBytes("UTF-8"))
    }
    val assets = Multimodal.readBinaryDir(spark, dir, glob = "*.img")
    val rows = assets.collect()
    assert(rows.length == 2, "glob filter must prune non-matching files pre-read")
    assert(rows.map(a => new String(a.content, "UTF-8")).toSet
      == Set("payload-alpha", "payload-beta"))
    assert(rows.map(_.asset_id).distinct.length == 2, "ids must be distinct")
    assert(rows.forall(_.meta.format == "img"))
    // same downstream stages as the synthetic table
    val feats = Multimodal.extractFeatures(assets, dim = 8).collect()
    assert(feats.length == 2 && feats.forall(_.features.length == 8))
  }

  private def mediaDir =
    new java.io.File(getClass.getResource("/media/fixture.ppm").toURI)
      .getParent

  test("REAL decode: checked-in PPM fixture through binaryFile ingest — " +
      "true width/height and exact luminance features") {
    // fixture.ppm: P6, 4x2, comment line in header; each row = two white
    // pixels then two black -> luminance signal [1,1,-1,-1,1,1,-1,-1]
    val assets = Multimodal.parseMeta(
      Multimodal.readBinaryDir(spark, mediaDir, glob = "*.ppm"))
    val a = assets.collect().head
    assert(a.meta == Multimodal.AssetMeta(4, 2, "ppm"),
      s"parsed header must carry the REAL dimensions: ${a.meta}")
    val f = Multimodal.extractFeaturesBatched(assets, dim = 4)
      .collect().head.features
    assert(f.corresponds(Array(1.0f, -1.0f, 1.0f, -1.0f))(
        (x, y) => math.abs(x - y) < 1e-6),
      s"segment luminance must be exact: ${f.toSeq}")
  }

  test("REAL decode: checked-in WAV fixture — PCM sample stats, not " +
      "stub hashes") {
    // fixture.wav: mono s16le, 800 samples: 400x +0.5 then 400x -0.5
    val assets = Multimodal.parseMeta(
      Multimodal.readBinaryDir(spark, mediaDir, glob = "*.wav",
        kind = "audio"))
    val a = assets.collect().head
    assert(a.meta == Multimodal.AssetMeta(800, 1, "wav"),
      s"parsed header must carry samples-per-channel and channels: ${a.meta}")
    val f = Multimodal.extractFeaturesBatched(assets, dim = 2)
      .collect().head.features
    assert(math.abs(f(0) - 0.5f) < 1e-6 && math.abs(f(1) + 0.5f) < 1e-6,
      s"segment means must be the true sample amplitudes: ${f.toSeq}")
  }

  // ---- PNG: build a valid stream in-test so every filter type is hit ----

  /** Minimal PNG encoder (test-side forward filters): `rows` =
    * unfiltered pixel bytes per row, `filters(r)` = the filter type to
    * encode row r with. Exercises [[Multimodal.decodePng]]'s unfilter
    * against independently-computed filtered bytes. */
  private def buildPng(w: Int, h: Int, colorType: Int,
                       rows: Array[Array[Int]],
                       filters: Array[Int]): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 1
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = t.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
        .array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- 0 until h) {
      val ft = filters(r)
      raw.write(ft)
      for (x <- 0 until w * bpp) {
        val v = rows(r)(x)
        val a = if (x >= bpp) rows(r)(x - bpp) else 0
        val b = if (r > 0) rows(r - 1)(x) else 0
        val c = if (x >= bpp && r > 0) rows(r - 1)(x - bpp) else 0
        val f = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw.write(f & 0xff)
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.toByteArray); d.finish()
      val buf = new Array[Byte](raw.size() * 2 + 64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("REAL decode: checked-in PNG fixture through binaryFile ingest — " +
      "true width/height via JDK zlib, no codec library") {
    // fixture.png: 8-bit RGB 4x2, each row two white then two black
    // pixels — the same image as fixture.ppm, so luminance features
    // must be format-independent
    val assets = Multimodal.parseMeta(
      Multimodal.readBinaryDir(spark, mediaDir, glob = "*.png"))
    val a = assets.collect().head
    assert(a.meta == Multimodal.AssetMeta(4, 2, "png"),
      s"parsed IHDR must carry the REAL dimensions: ${a.meta}")
    val f = Multimodal.extractFeaturesBatched(assets, dim = 4)
      .collect().head.features
    assert(f.corresponds(Array(1.0f, -1.0f, 1.0f, -1.0f))(
        (x, y) => math.abs(x - y) < 1e-6),
      s"PNG luminance must equal the PPM fixture's: ${f.toSeq}")
  }

  test("PNG unfilter reconstructs all five filter types, RGB and grayscale") {
    // a 3x5 grayscale ramp encoded with one row per filter type — the
    // decoder must invert sub/up/average/paeth exactly
    val g = Array(
      Array(10, 20, 30), Array(40, 60, 80), Array(90, 120, 150),
      Array(130, 170, 210), Array(200, 225, 250))
    val png = buildPng(3, 5, colorType = 0, g, Array(0, 1, 2, 3, 4))
    val got = Multimodal.decodePng(png)
    assert(got.isDefined, "all-filters grayscale PNG must decode")
    val (meta, lum) = got.get
    assert(meta == Multimodal.AssetMeta(3, 5, "png"))
    val expect = g.flatten.map(v => v / 255.0f * 2.0f - 1.0f)
    assert(lum.corresponds(expect)((x, y) => math.abs(x - y) < 1e-6),
      s"unfiltered luminance drifted: ${lum.toSeq} vs ${expect.toSeq}")
    // RGB with paeth on every row after the first
    val rgb = Array(
      Array(255, 0, 0, 0, 255, 0), Array(0, 0, 255, 255, 255, 255))
    val png2 = buildPng(2, 2, colorType = 2, rgb, Array(1, 4))
    val (m2, l2) = Multimodal.decodePng(png2).get
    assert(m2 == Multimodal.AssetMeta(2, 2, "png"))
    val e2 = Array(255 / (3f * 255), 255 / (3f * 255),
      255 / (3f * 255), 765 / (3f * 255)).map(_ * 2f - 1f)
    assert(l2.corresponds(e2)((x, y) => math.abs(x - y) < 1e-6),
      s"RGB paeth row drifted: ${l2.toSeq}")
  }

  test("hostile PNG: truncated IDAT, lying IHDR, lying chunk length, " +
      "unsupported profiles — all None, never crash or misdecode") {
    val good = buildPng(3, 3, colorType = 0,
      Array.fill(3)(Array(1, 2, 3)), Array(0, 0, 0))
    assert(Multimodal.decodePng(good).isDefined)
    // truncated IDAT: the cut chunk no longer fits its declared length
    assert(Multimodal.decodePng(good.dropRight(20)).isEmpty,
      "truncated stream must be malformed, not short-decoded")
    // lying IHDR dims: 2^24 x 2^24 against a tiny IDAT must be rejected
    // by the deflate-expansion bound BEFORE allocating the raw buffer
    val lying = good.clone()
    val bb = java.nio.ByteBuffer.allocate(8).putInt(1 << 24).putInt(1 << 24)
    System.arraycopy(bb.array(), 0, lying, 16, 8)
    assert(Multimodal.decodePng(lying).isEmpty,
      "lying dims must fail the expansion bound, never allocate")
    // dims lying SMALL (inflate yields more than promised) also rejected
    val small = buildPng(3, 3, colorType = 0,
      Array.fill(3)(Array(1, 2, 3)), Array(0, 0, 0))
    val bb2 = java.nio.ByteBuffer.allocate(4).putInt(1)
    System.arraycopy(bb2.array(), 0, small, 20, 4) // height := 1
    assert(Multimodal.decodePng(small).isEmpty,
      "overlong inflate output must be rejected, not truncated")
    // chunk length 0xFFFFFFFF: unsigned Long walk ends as malformed
    val hugeLen = good.clone()
    java.util.Arrays.fill(hugeLen, 33, 37, 0xff.toByte)
    assert(Multimodal.decodePng(hugeLen).isEmpty)
    // unsupported profiles stay on the stub path: palette / 16-bit
    assert(Multimodal.pngHeader(buildPng(2, 2, colorType = 0,
      Array.fill(2)(Array(0, 0)), Array(0, 0))
      .updated(25, 3.toByte)).isEmpty, "palette PNG is not decodable")
    assert(Multimodal.pngHeader(buildPng(2, 2, colorType = 0,
      Array.fill(2)(Array(0, 0)), Array(0, 0))
      .updated(24, 16.toByte)).isEmpty, "16-bit PNG is not decodable")
  }

  test("decode dispatch: malformed magic bytes fall back to the stub, " +
      "never crash") {
    assert(Multimodal.decodePpm("P6 not really".getBytes).isEmpty)
    assert(Multimodal.decodePpm(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.fill[Byte](100)(0)).isEmpty)
    // truncated payload (header promises more pixels than present)
    assert(Multimodal.decodePpm("P6\n9 9\n255\n ".getBytes).isEmpty)
  }

  test("hostile headers: overflowing sizes return None, never hang or " +
      "crash (untrusted-payload contract)") {
    // PPM dimensions whose w*h*3 wraps Int: must be rejected by the
    // Long-math length guard, not crash in allocation
    assert(Multimodal.decodePpm("P6\n46341 46341\n255\n ".getBytes).isEmpty)
    assert(Multimodal.decodePpm(
      "P6\n999999999999 2\n255\n ".getBytes).isEmpty)
    // WAV chunk with size 0xFFFFFFF8: a naive Int advance is 0 (infinite
    // loop); 0x7FFFFFF0 wraps an Int cursor negative (OOB throw)
    def wav(size: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
      bb.put("junk".getBytes); bb.putInt(size.toInt)
      bb.put(new Array[Byte](40))
      bb.array()
    }
    assert(Multimodal.decodeWav(wav(0xFFFFFFF8L)).isEmpty)
    assert(Multimodal.decodeWav(wav(0x7FFFFFF0L)).isEmpty)
    // a VALID PCM16 header whose data chunk clamps to zero real bytes is
    // a legal zero-sample file: Some(empty samples), never a crash and
    // never a stub-fallback None (that would silently change features
    // for real silence assets)
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(100) // declares 100, 0 present
    val empty = Multimodal.decodeWav(bb.array().take(44))
    assert(empty.exists { case (meta, samples) =>
      meta == Multimodal.AssetMeta(0, 1, "wav") && samples.isEmpty },
      s"zero-sample WAV must parse, got $empty")
  }

  // ---- JPEG: JDK javax.imageio decode (java.desktop, no external codec) --

  private def jpegFixture: Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      new java.io.File(getClass.getResource("/media/fixture.jpg").toURI)
        .getPath))

  test("REAL decode: checked-in JPEG fixture through binaryFile ingest — " +
      "true width/height from SOF, luminance via the JDK's own reader") {
    // fixture.jpg: 32x8 quality-1.0 JPEG, left 16 columns white, right 16
    // black. dim=16 segments = half a row each, so features alternate
    // bright/dark; lossy-codec tolerance is loose but sign-separating
    val assets = Multimodal.parseMeta(
      Multimodal.readBinaryDir(spark, mediaDir, glob = "*.jpg"))
    val a = assets.collect().head
    assert(a.meta == Multimodal.AssetMeta(32, 8, "jpeg"),
      s"parsed SOF must carry the REAL dimensions: ${a.meta}")
    val f = Multimodal.extractFeaturesBatched(assets, dim = 16)
      .collect().head.features
    assert(f.zipWithIndex.forall { case (v, i) =>
        if (i % 2 == 0) v > 0.7f else v < -0.7f },
      s"JPEG segment luminance must alternate white/black halves: ${f.toSeq}")
  }

  test("hostile JPEG: truncated entropy data, lying SOF dims, garbage " +
      "markers — all None, never crash or giant-allocate") {
    val good = jpegFixture
    assert(Multimodal.decodeJpeg(good).isDefined)
    // truncated mid-scan: ImageIO's error (or partial null) becomes None
    assert(Multimodal.decodeJpeg(good.dropRight(good.length / 3)).isEmpty,
      "truncated stream must be malformed, not short-decoded")
    // lying SOF dims: 2^15 x 2^15 against the tiny scan is rejected by
    // the pixel cap BEFORE any raster allocation
    def sofAt(b: Array[Byte]): Int = {
      var o = 2
      while (!((b(o) & 0xff) == 0xff && (b(o + 1) & 0xff) == 0xc0)) {
        o += 2 + (((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff))
      }
      o
    }
    val lying = good.clone()
    val sof = sofAt(lying)
    lying(sof + 5) = 0x80.toByte; lying(sof + 6) = 0 // height := 32768
    lying(sof + 7) = 0x80.toByte; lying(sof + 8) = 0 // width  := 32768
    assert(Multimodal.jpegHeader(lying).isEmpty &&
      Multimodal.decodeJpeg(lying).isEmpty,
      "lying SOF dims must fail the pixel cap, never allocate")
    // zero width is malformed, not a zero-length decode
    val zeroW = good.clone()
    zeroW(sofAt(zeroW) + 7) = 0; zeroW(sofAt(zeroW) + 8) = 0
    assert(Multimodal.decodeJpeg(zeroW).isEmpty)
    // SOI followed by a non-marker byte: malformed walk, None
    assert(Multimodal.decodeJpeg(
      Array(0xff, 0xd8, 0x12, 0x34).map(_.toByte)).isEmpty)
    // a segment length pointing past the payload ends the walk as
    // malformed (no wrap, no hang)
    val overLen = good.take(sofAt(good) + 2) ++ Array(0x7f.toByte, 0xff.toByte)
    assert(Multimodal.decodeJpeg(overLen).isEmpty)
    // wrong magic entirely: the PNG fixture is not a JPEG
    assert(Multimodal.decodeJpeg(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        new java.io.File(getClass.getResource("/media/fixture.png").toURI)
          .getPath))).isEmpty)
  }

  // ---- MP3 / H.264: REAL header metadata (codec-free), stubbed signal --

  private def mediaBytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      new java.io.File(getClass.getResource(s"/media/$name").toURI)
        .getPath))

  test("REAL metadata: checked-in MP3 fixture — frame walk yields true " +
      "sample count and channels through parseMeta") {
    // fixture.mp3: ID3v2 tag (20-byte payload) + 4 MPEG-1 Layer III
    // frames, 128 kbps 44.1 kHz mono -> 4*1152 samples per channel
    val assets = Multimodal.parseMeta(
      Multimodal.readBinaryDir(spark, mediaDir, glob = "*.mp3",
        kind = "audio"))
    val a = assets.collect().head
    assert(a.meta == Multimodal.AssetMeta(4608, 1, "mp3"),
      s"MP3 frame walk must carry real samples/channels: ${a.meta}")
  }

  test("REAL metadata: checked-in H.264 fixture — SPS parse yields true " +
      "dimensions through parseMeta") {
    // fixture.h264: Annex B SPS (baseline, 4 MBs x 3 map units, no
    // crop) + PPS + fake IDR -> 64x48
    val assets = Multimodal.parseMeta(
      Multimodal.readBinaryDir(spark, mediaDir, glob = "*.h264",
        kind = "video"))
    val a = assets.collect().head
    assert(a.meta == Multimodal.AssetMeta(64, 48, "h264"),
      s"SPS parse must carry real dimensions: ${a.meta}")
  }

  test("unit sampling splits at REAL media boundaries: H.264 NALs and " +
      "MP3 frames, fixed chunks only as fallback") {
    import spark.implicits._
    val h264 = mediaBytes("fixture.h264")
    val mp3 = mediaBytes("fixture.mp3")
    val assets = Seq(
      Multimodal.Asset(1L, "video", h264, Multimodal.AssetMeta(0, 0, "h264")),
      Multimodal.Asset(2L, "audio", mp3, Multimodal.AssetMeta(0, 0, "mp3")),
      Multimodal.Asset(3L, "image", Array.fill[Byte](100)(7),
        Multimodal.AssetMeta(0, 0, "raw"))).toDS()
    val units = Multimodal.unitSample(assets, every = 1, fallbackBytes = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2))).groupBy(_._1)
    // fixture.h264 = SPS + PPS + IDR: three NAL units, each beginning
    // with its own start code, concatenation re-forms the payload
    val nals = units(1L).sortBy(_._2).map(_._3)
    assert(nals.length == 3, s"3 NAL units expected, got ${nals.length}")
    assert(nals.forall(u => u.take(4).sameElements(
      Array[Byte](0, 0, 0, 1))), "every unit must start at a start code")
    assert(nals.flatten.sameElements(h264), "units must tile the payload")
    assert((nals(0)(4) & 0x1f) == 7 && (nals(1)(4) & 0x1f) == 8 &&
      (nals(2)(4) & 0x1f) == 5, "SPS, PPS, IDR in stream order")
    // fixture.mp3 = ID3v2 + 4 frames of 417 bytes: four units, each
    // sync'd at 0xFFFB
    val frames = units(2L).sortBy(_._2).map(_._3)
    assert(frames.length == 4, s"4 MP3 frames expected, got ${frames.length}")
    assert(frames.take(3).forall(_.length == 417))
    assert(frames.forall(f => (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xfb),
      "every unit must begin at a frame sync")
    // unstructured payload: fixed-chunk fallback (100 bytes / 40 = 3)
    assert(units(3L).length == 3)
    // every=2 takes units 0 and 2
    val sampled = Multimodal.unitSample(assets.filter(_.asset_id == 1L),
      every = 2).collect().map(_.getInt(1)).sorted
    assert(sampled.toSeq == Seq(0, 2))
    // invalid strides fail fast on the driver, not as an
    // ArithmeticException inside executor tasks
    intercept[IllegalArgumentException] {
      Multimodal.unitSample(assets, every = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.unitSample(assets, every = 1, fallbackBytes = 0)
    }
  }

  test("hostile MP3/H.264 headers: false syncs, lying sizes, truncation " +
      "all return None, never hang (untrusted-payload contract)") {
    val mp3 = mediaBytes("fixture.mp3")
    // a single valid frame amid garbage: the >=2-consecutive-frames
    // guard rejects false positives
    assert(Multimodal.mp3Header(mp3.take(10 + 20 + 417)).isEmpty,
      "one frame must not be enough")
    // truncated mid-frame: frame length overruns payload -> None
    assert(Multimodal.mp3Header(mp3.dropRight(7)).isEmpty)
    // ID3 size pointing past the payload
    val lyingId3 = mp3.clone(); lyingId3(9) = 0x7f.toByte
    lyingId3(8) = 0x7f.toByte; lyingId3(7) = 0x7f.toByte
    assert(Multimodal.mp3Header(lyingId3.take(64)).isEmpty)
    // free-format (bitrate idx 0) and reserved (15) indexes are rejected
    for (idx <- Seq(0x00, 0xf0)) {
      val f = mp3.clone(); f(30 + 2) = idx.toByte // first frame's byte 3
      assert(Multimodal.mp3Header(f).isEmpty)
    }
    // sync word inside random bytes: never a parse, never a hang
    val junk = Array.tabulate[Byte](2048)(i => (i * 31).toByte)
    junk(100) = 0xff.toByte; junk(101) = 0xfb.toByte
    assert(Multimodal.mp3Header(junk).isEmpty)

    val h264 = mediaBytes("fixture.h264")
    // truncated inside the SPS: bit reader must return None, not throw
    assert(Multimodal.h264Header(h264.take(7)).isEmpty)
    // no start code at all
    assert(Multimodal.h264Header(Array.fill[Byte](64)(0x55)).isEmpty)
    // NAL type is PPS only (drop the SPS): no dimensions to parse
    assert(Multimodal.h264Header(h264.drop(10)).isEmpty)
    // the WAV fixture is not an H.264 stream
    assert(Multimodal.h264Header(mediaBytes("fixture.wav")).isEmpty)
    assert(Multimodal.mp3Header(mediaBytes("fixture.wav")).isEmpty)
  }

  /** Minimal 24bpp BMP encoder (bottom-up rows, BGR, 4-byte row
    * padding): the SECOND container for the same pixels, so the
    * perceptual near-dup test can re-encode without any codec lib. */
  private def buildBmp(w: Int, h: Int,
                       rows: Array[Array[Int]]): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (r <- (h - 1) to 0 by -1) { // bottom-up
      for (x <- 0 until w) {
        // rows carry RGB triples; BMP stores BGR
        buf.put(rows(r)(x * 3 + 2).toByte)
        buf.put(rows(r)(x * 3 + 1).toByte)
        buf.put(rows(r)(x * 3).toByte)
      }
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  /** Minimal mono s16le WAV encoder — the audio counterpart of
    * [[buildBmp]], so perceptual robustness tests can synthesize
    * volume-scaled / resampled copies without a codec lib. */
  private def buildWav(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("perceptual near-dup is volume- and resampling-invariant for " +
      "audio: scaled/upsampled WAV copies collapse, distinct clips survive") {
    import spark.implicits._
    // clip A: positive-biased slow sine (features well away from zero,
    // so sign-LSH buckets are stable under small perturbations)
    val n = 1600
    def aAt(i: Int): Double = 0.5 + 0.3 * math.sin(2 * math.Pi * i / n)
    val clipA = Array.tabulate(n)(i => (aAt(i) * 32767).toShort)
    // volume-scaled copy: every sample halved — segment means halve,
    // the feature VECTOR direction is unchanged (cosine ≈ 1)
    val halfVol = clipA.map(s => (s / 2).toShort)
    // 2x-resampled copy: every sample duplicated — each segment covers
    // the same audio span, so segment means are exactly preserved
    val upsampled = clipA.flatMap(s => Array(s, s))
    // distinct clip B: a ramp (different sign pattern entirely)
    val clipB = Array.tabulate(n)(i => ((0.8 - 1.6 * i / n) * 32767).toShort)
    // distinct clip C: inverted modulation — SAME all-positive sign
    // bucket as A, so it becomes an LSH candidate and must be rejected
    // by the cosine verification, not by bucketing luck
    val clipC = Array.tabulate(n)(i =>
      ((0.5 - 0.3 * math.sin(2 * math.Pi * i / n)) * 32767).toShort)
    val meta = Multimodal.AssetMeta(0, 0, "bin")
    val assets = Seq(
      Multimodal.Asset(1L, "audio", buildWav(clipA), meta),
      Multimodal.Asset(2L, "audio", buildWav(halfVol), meta),
      Multimodal.Asset(3L, "audio", buildWav(upsampled), meta),
      Multimodal.Asset(10L, "audio", buildWav(clipB), meta),
      Multimodal.Asset(11L, "audio", buildWav(clipC), meta)
    ).toDS()
    // the invariance lives in the decoded-PCM features (segment means),
    // not in byte equality: the three A-family payloads are all
    // byte-distinct yet must land within cosine 0.99 of each other
    val survivors = Multimodal.nearDupAssets(assets, dim = 16,
        threshold = 0.99)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 10L, 11L),
      s"volume-scaled (2) and resampled (3) copies must collapse onto " +
        s"clip A (1); the ramp (10) and inverted clip (11) survive: " +
        s"$survivors")
  }

  test("perceptual near-dup: PNG and BMP re-encodings of the same " +
      "pixels collapse to one survivor, distinct images all survive") {
    import spark.implicits._
    val w = 4; val h = 2
    def img(pattern: Int => Int): Array[Array[Int]] =
      Array.tabulate(h)(r => Array.tabulate(w * 3)(i => pattern(r * w + i / 3)))
    // image A: two white then two black per row; B: inverted; C: checker
    val imgA = img(p => if (p % 4 < 2) 255 else 0)
    val imgB = img(p => if (p % 4 < 2) 0 else 255)
    val imgC = img(p => if (p % 2 == 0) 255 else 0)
    val meta = Multimodal.AssetMeta(0, 0, "bin")
    val assets = Seq(
      Multimodal.Asset(1L, "image",
        buildPng(w, h, 2, imgA, Array(0, 1)), meta),
      Multimodal.Asset(2L, "image", buildBmp(w, h, imgA), meta), // re-encode of 1
      Multimodal.Asset(3L, "image",
        buildPng(w, h, 2, imgB, Array(2, 4)), meta),
      Multimodal.Asset(4L, "image", buildBmp(w, h, imgC), meta)
    ).toDS()
    // sanity: the two containers decode to the SAME feature vector
    val feats = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    assert(feats(1L) == feats(2L),
      s"PNG and BMP of the same pixels must yield identical features: " +
        s"${feats(1L)} vs ${feats(2L)}")
    assert(feats(1L) != feats(3L), "distinct pixels, distinct features")
    val survivors = Multimodal.nearDupAssets(assets, dim = 8,
        threshold = 0.99)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L, 4L),
      s"the BMP re-encode must collapse onto the PNG (smallest id), " +
        s"distinct fixtures survive: $survivors")
  }

  test("resizePixels: real area-average downsample, exact means, " +
      "decodable output, container-independent, pass-through on junk") {
    import spark.implicits._
    // 4x4 gray PPM with four 2x2 quadrants of known grays: the 2x2
    // area-average resize must yield EXACTLY the quadrant grays
    def ppm(w: Int, h: Int, grays: Array[Int]): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ grays.flatMap(g => Array(g.toByte, g.toByte, g.toByte))
    }
    val quad = Array(
      40, 40, 200, 200,
      40, 40, 200, 200,
      90, 90, 250, 250,
      90, 90, 250, 250)
    // RGB rows for the PNG/BMP twins of the SAME pixels
    val rows = (0 until 4).map(y => (0 until 4).flatMap(x =>
      Seq.fill(3)(quad(y * 4 + x))).toArray).toArray
    val assets = Seq(
      Multimodal.Asset(1L, "image", ppm(4, 4, quad),
        Multimodal.AssetMeta(0, 0, "bin")),
      Multimodal.Asset(2L, "image", buildBmp(4, 4, rows),
        Multimodal.AssetMeta(0, 0, "bin")),
      Multimodal.Asset(3L, "blob", Array[Byte](1, 2, 3, 4),
        Multimodal.AssetMeta(0, 0, "bin"))).toDS()
    val out = Multimodal.resizePixels(assets, 2, 2)
      .collect().map(a => a.asset_id -> a).toMap
    // exact quadrant means survive the gray round-trip (inputs are
    // uniform quadrants, so mean == the quadrant's own gray)
    val r1 = out(1L)
    assert(r1.meta == Multimodal.AssetMeta(2, 2, "ppm"))
    val dec = Multimodal.decodePpm(r1.content)
    assert(dec.isDefined, "resized payload must be decodable PPM")
    val grays = dec.get._2.map(l =>
      math.round((l + 1.0f) / 2.0f * 255.0f))
    assert(grays.toSeq == Seq(40, 200, 90, 250),
      s"area means must be exact on uniform quadrants: ${grays.toSeq}")
    // container independence: the BMP of the same pixels resizes to
    // byte-identical output (pixels in, pixels out)
    assert(java.util.Arrays.equals(r1.content, out(2L).content),
      "PPM and BMP of identical pixels must resize identically")
    // junk passes through byte-identical
    assert(java.util.Arrays.equals(out(3L).content,
      Array[Byte](1, 2, 3, 4)) && out(3L).meta.format == "bin",
      "undecodable payloads must pass through untouched")
  }
}
