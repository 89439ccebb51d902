package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.CorpusWriter

/** Streaming sidecar LANDING — the ingest half the other streaming
  * duals assume already happened: where [[StreamNovelty]] /
  * [[StreamWinnow]] / [[StreamAnn]] PROBE a frozen sidecar, this op
  * GROWS one, appending each arriving micro-batch through the same
  * landing functions the batch path uses ([[CorpusWriter
  * .appendToGramIndex]] / [[CorpusWriter.appendToWinnowIndex]]), so a
  * corpus ingested as a stream ends with the BIT-same sidecar as one
  * landed in batches (StreamLandingSpec pins it).
  *
  * Arrival-order independence is inherited from the landing functions'
  * anti-join discipline: each batch appends only fingerprints the index
  * has never seen, so any batch split and ordering yields the same
  * final row SET (the write+append ≡ write-union identity, streamed).
  * foreachBatch runs batches strictly sequentially, so the per-batch
  * anti-join always sees every earlier batch's appends — the same
  * ordering contract the batch landing chain has.
  *
  * The landing stream and any probe streams over the same sidecar must
  * not interleave mid-batch semantics: a probe sees the sidecar as of
  * its own batch start (parquet snapshot), the same read-your-landings
  * story as the batch path. */
object StreamLanding {

  /** Configure (not start) gram-index landing: each micro-batch of
    * (`textCol`) documents appends its unseen gram fingerprints into
    * `table` (a [[CorpusWriter.writeGramIndex]] sidecar). `onBatch`
    * fires after each landing commits (checkpoint/telemetry hook). */
  def intoGramIndex(spark: SparkSession, docs: DataFrame, textCol: String,
      table: String)(onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          CorpusWriter.appendToGramIndex(batch, textCol, table)
        onBatch(batchId)
      }

  /** Configure (not start) winnow-index landing: the [[intoGramIndex]]
    * discipline at [[graft.pipeline.Winnow]] fingerprint grain. */
  def intoWinnowIndex(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, table: String)(
      onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          CorpusWriter.appendToWinnowIndex(batch, idCol, textCol, table)
        onBatch(batchId)
      }
}
