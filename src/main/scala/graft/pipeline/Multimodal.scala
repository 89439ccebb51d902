package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import graft.functions.RollingHashExpr

/** Multimodal columns for a training-data pipeline: image/audio/video
  * travel as opaque `binary` content plus typed metadata; decode /
  * feature-extract runs as a batched per-partition pass (the JVM analogue
  * of `mapInPandas` — one library call per batch, not per row).
  *
  * The actual media decode is STUBBED: this container ships no image or
  * audio libraries, so [[decodeStub]] derives a deterministic fake feature
  * vector from the bytes. Everything around the stub — the schema, the
  * typed Dataset plumbing, the batch shape, the frame sampling, the
  * partitioning contract — is real and tested; swapping in a true decoder
  * changes one function.
  *
  * Scale notes: assets are heavy (MBs each), so the pipeline never
  * shuffles raw content — features extract map-side and only the small
  * feature rows move. Use `repartition(n)` BEFORE extract when asset
  * sizes are skewed (content-size salting), never after.
  */
object Multimodal {

  /** An asset row: opaque content + typed metadata. */
  case class MediaAsset(
      asset_id: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int, // images/video
      height: Int,
      sample_rate: Int) // audio

  /** Extracted features: fixed-dim embedding + sampled frame fingerprints. */
  case class MediaFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      fingerprint: Long,
      embedding: Array[Float],
      frame_prints: Array[Long])

  val EmbeddingDim = 8
  val FrameSamples = 4

  implicit val assetEnc: Encoder[MediaAsset] = Encoders.product[MediaAsset]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB decode: a real implementation would decode pixels/samples here
    * (??? in spirit); the deterministic fake hashes byte stripes so tests
    * can assert exact outputs. Stripes are gathered with primitive loops —
    * the stub runs once per asset over every content byte, so per-byte
    * boxing would dominate the whole extract pass. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val out = new Array[Float](EmbeddingDim)
    var i = 0
    while (i < EmbeddingDim) {
      val len = if (content.length > i) (content.length - 1 - i) / EmbeddingDim + 1 else 0
      val stripe = new Array[Byte](len)
      var j = i
      var k = 0
      while (j < content.length) { stripe(k) = content(j); k += 1; j += EmbeddingDim }
      out(i) = (RollingHashExpr.hash(stripe).toDouble / (1L << 32).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Frame sampling stub: fingerprint of each of `FrameSamples` contiguous
    * byte slices (a video decoder would grab I-frames here). */
  def sampleFrames(content: Array[Byte]): Array[Long] = {
    val n = content.length
    if (n == 0) Array.fill(FrameSamples)(0L)
    else Array.tabulate(FrameSamples) { f =>
      val from = (n.toLong * f / FrameSamples).toInt
      val until = (n.toLong * (f + 1) / FrameSamples).toInt
      RollingHashExpr.hash(java.util.Arrays.copyOfRange(content, from, until))
    }
  }

  /** Batched per-partition extraction (batch shape = the library-call
    * granularity a real decoder needs). */
  def extract(assets: Dataset[MediaAsset], batchSize: Int = 64): Dataset[MediaFeatures] =
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // One "library call" per batch in a real decoder.
        batch.iterator.map { a =>
          MediaFeatures(
            asset_id = a.asset_id,
            modality = a.modality,
            n_bytes = a.content.length.toLong,
            fingerprint = RollingHashExpr.hash(a.content),
            embedding = decodeStub(a.content),
            frame_prints = sampleFrames(a.content))
        }
      }
    }

  /** Synthetic deterministic asset fixture (no media libs in the sandbox). */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    val rows = (0 until n).map { i =>
      val bytes = Array.tabulate(256 + i)(j => ((i * 31 + j * 7) % 251).toByte)
      val modality = Seq("image", "audio", "video")(i % 3)
      MediaAsset(i.toLong, modality, bytes, 64 + i, 48 + i, 16000)
    }
    spark.createDataset(rows)
  }
}
