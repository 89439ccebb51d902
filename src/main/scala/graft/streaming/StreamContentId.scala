package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Multimodal

/** Streaming content-ID admission — [[Multimodal.contentIdAgainstIndex]]
  * composed with the streaming front door (r17): each arriving
  * micro-batch of ASSETS extracts map-side and probes the frozen frame
  * index, so an upload stream gets its "matches held content?" verdict
  * at ingest latency. No state store; arrival-order independent, so the
  * union over batches is bit-equal to the batch probe over the same
  * rows (StreamContentIdSpec pins the replay — the [[StreamAnn]]
  * convention at frame grain). */
object StreamContentId {

  /** Configure (not start) the prober: `assets` is a streaming
    * DataFrame with [[Multimodal.MediaAsset]]'s columns; `sink`
    * receives each micro-batch's (asset_id, n_frames, n_matched,
    * matched) rows and the batch id. */
  def probe(spark: SparkSession, assets: DataFrame, table: String,
      minShared: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    assets.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import Multimodal.assetEnc
          sink(Multimodal.contentIdAgainstIndex(spark, table,
            batch.as[Multimodal.MediaAsset], minShared), batchId)
        }
      }

  /** The SHIFT-TOLERANT prober (r19): each micro-batch probes the
    * stored shingle index ([[Multimodal.shiftContentIdAgainstIndex]])
    * — a re-trimmed upload of held content still matches at ingest
    * latency, where the aligned [[probe]] scores it 0. Same
    * no-state-store / arrival-order-independent contract. */
  def probeShifted(spark: SparkSession, assets: DataFrame, table: String,
      minShared: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    assets.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import Multimodal.assetEnc
          sink(Multimodal.shiftContentIdAgainstIndex(spark, table,
            batch.as[Multimodal.MediaAsset], minShared), batchId)
        }
      }
}
