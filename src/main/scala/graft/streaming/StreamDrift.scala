package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.SourceDrift

/** Streaming distribution-drift monitor — [[SourceDrift]] (q105)
  * composed with the streaming front door, the SEVENTH batch/streaming
  * duality: the reference term distribution computes ONCE from the
  * standing corpus ([[SourceDrift.referencePpm]] — a v-row train-time
  * artifact, frozen like q77's weights, q92's packed filter and the
  * q67 sidecar) and every arriving micro-batch reports its L1 ppm
  * distance from it. This is the ingest-QA alarm: a crawl whose
  * batches drift from the corpus they are about to join gets a human
  * look BEFORE admission, not after a training run.
  *
  * No state store and the reference never changes mid-stream, so each
  * batch's report is arrival-order independent and BIT-equal to
  * [[SourceDrift.driftFromReference]] over the same rows
  * (StreamDriftSpec pins the replay). Per-batch work is one tokenize
  * scan, a ≤v-row broadcast join and two 1-row aggregates. */
object StreamDrift {

  /** Configure (not start) the monitor: `docs` is a streaming
    * DataFrame carrying `textCol`; `ref` the frozen corpus reference;
    * `sink` receives each micro-batch's 1-row
    * `(n_docs, n_tokens, l1_ppm)` report and the batch id. The caller
    * sets trigger/queryName and calls `.start()`. */
  def monitor(docs: DataFrame, textCol: String, ref: Seq[(String, Long)])(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, frames) = graft.ops.Materialize.collecting {
          sink(SourceDrift.driftFromReference(batch, textCol, ref), batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
