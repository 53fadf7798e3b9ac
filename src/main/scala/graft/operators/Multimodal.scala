package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.sources.CrawlCorpus.splitmix64

/** A multimodal asset row: media treated as an opaque binary column with
  * typed metadata, exactly as a 100 TB training-data pipeline stores
  * image/audio/video alongside text. */
final case class MediaRow(
    media_id: Long,
    url: String,
    kind: String, // "image" | "audio" | "video"
    bytes: Array[Byte]
)

/** Decoded/derived features. The decode itself is STUBBED (this container
  * has no codec libraries); the Spark-side plumbing — schema, typed Dataset
  * transform, partition-sized batching, deterministic output — is real and
  * tested. A production deployment swaps `decodeStub` for a real codec
  * (JavaCPP/FFmpeg or an Arrow-batched Python worker) without touching the
  * plan shape. */
final case class MediaFeatures(
    media_id: Long,
    url: String,
    kind: String,
    n_bytes: Long,
    content_hash: Long,
    width: Int,     // stub-decoded
    height: Int,    // stub-decoded
    n_frames: Int,  // stub-decoded (1 for images)
    embedding: Seq[Float] // stub feature vector, dim 8
)

object Multimodal {

  /** Deterministic fake decode: dimensions and an 8-dim feature vector
    * derived from a 64-bit content hash. Marker for the real codec. */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int, Seq[Float]) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val w = 64 + (math.abs(splitmix64(h ^ 1)) % 1024).toInt
    val ht = 64 + (math.abs(splitmix64(h ^ 2)) % 1024).toInt
    val frames = kind match {
      case "image" => 1
      case "audio" => 1 + (math.abs(splitmix64(h ^ 3)) % 4096).toInt
      case _       => 1 + (math.abs(splitmix64(h ^ 4)) % 512).toInt
    }
    val emb = (0 until 8).map { d =>
      ((splitmix64(h ^ (100 + d)) % 1000L).toFloat / 1000.0f)
    }
    (w, ht, frames, emb)
  }

  def contentHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Feature extraction as a typed mapPartitions (the Scala analogue of a
    * mapInPandas batch UDF): map-local, shuffle-free; the binary column is
    * pruned at the scan when downstream selects drop it. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.bytes == null) Array.emptyByteArray else row.bytes
        val (w, h, frames, emb) = decodeStub(row.kind, bytes)
        MediaFeatures(row.media_id, row.url, row.kind, bytes.length.toLong,
          contentHash(bytes), w, h, frames, emb)
      }
    }
  }

  /** Batch-shaped decode plumbing: rows flow to the (stub) codec in
    * fixed-size record batches — the shape a real Arrow-batched codec
    * worker (mapInPandas / JavaCPP-FFmpeg) consumes, so swapping the stub
    * for a real decoder changes one function, not the plan. Output is
    * row-identical to `extractFeatures` for every batch size
    * (MultimodalSpec). */
  def extractFeaturesBatched(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeStubBatch)
    }
  }

  /** The batch entry point a real codec would implement (one upload/DMA or
    * one Arrow RecordBatch per call). */
  def decodeStubBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { row =>
      val bytes = if (row.bytes == null) Array.emptyByteArray else row.bytes
      val (w, h, frames, emb) = decodeStub(row.kind, bytes)
      MediaFeatures(row.media_id, row.url, row.kind, bytes.length.toLong,
        contentHash(bytes), w, h, frames, emb)
    }

  /** Resize plumbing (decode side stubbed): clamps target dims to the
    * source aspect box and derives a deterministic fake resized-content
    * hash — schema, pruning and determinism are the real parts. */
  def resizeStub(features: Dataset[MediaFeatures], targetW: Int, targetH: Int): DataFrame = {
    val scale = least(
      lit(targetW.toDouble) / greatest(col("width"), lit(1)).cast("double"),
      lit(targetH.toDouble) / greatest(col("height"), lit(1)).cast("double"))
    features.toDF()
      .withColumn("resized_w", greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("resized_h", greatest(floor(col("height") * scale), lit(1)).cast("int"))
      .withColumn("resized_hash",
        xxhash64(col("content_hash"), col("resized_w"), col("resized_h")))
  }

  /** Deterministic synthetic media table (payload = hashed filler bytes). */
  def synthMedia(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, n, 1, math.max(spark.sparkContext.defaultParallelism, 1)).map { id =>
      val k = kinds((id % 3).toInt)
      val len = 256 + (math.abs(splitmix64(seed ^ id)) % 4096).toInt
      val bytes = Array.tabulate[Byte](len)(i => (splitmix64(seed ^ id ^ (i * 0x9e37L)) & 0xff).toByte)
      MediaRow(id, s"test://media/$id.$k", k, bytes)
    }
  }

  /** Frame-sampling plumbing demo: one row per sampled frame index —
    * a Generator (explode) over the stub-decoded frame count. */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int = 30): DataFrame = {
    val maxIdx = greatest(floor((col("n_frames") - 1) / lit(everyN.toDouble)).cast("int"), lit(0))
    features.toDF().select(col("media_id"), col("kind"), col("n_frames"),
        explode(sequence(lit(0), maxIdx)).as("sample_idx"))
      .select(col("media_id"), col("kind"), col("n_frames"),
        (col("sample_idx") * everyN).as("frame_idx"))
  }
}
