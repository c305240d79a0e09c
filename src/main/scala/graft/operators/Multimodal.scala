package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder mandate; SURVEY.md §2.5 C4 family):
  * image/audio/video travel as opaque `binary` columns with typed
  * metadata, processed by iterator-based `mapPartitions` stages so one
  * task streams through its partition without materializing it — the
  * distributed shape a real decoder plugs into.
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake features from the bytes. The
  * Spark-side plumbing — schema, encoders, partition-preserving batch
  * iteration, feature dimensionality — is real and tested; swapping
  * `decodeStub` for a JNI/codec call is a one-function change.
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

  /** ??? real decode — requires codec libraries absent from this
    * environment. Deterministic stand-in: per-dimension rolling hash over
    * the payload bytes, scaled to [-1, 1]. */
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
        decodeStub(a.content, dim)))
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
          decodeStub(a.content, dim)))
      }
    }
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

  /** Metadata-level resize: pure column expressions (no payload touch) —
    * the cheap path a planner should prefer when only metadata is read. */
  def resizeMeta(assets: Dataset[Asset], w: Int, h: Int): DataFrame =
    assets.toDF().withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.format").as("format")))

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
