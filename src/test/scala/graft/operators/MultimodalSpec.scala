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
}
