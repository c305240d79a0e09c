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
}
