package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Winnow

/** Streaming winnow-grain admission — [[Winnow.admitAgainstIndex]]
  * (q131) composed with the streaming front door, the TENTH
  * batch/streaming duality: the standing corpus's winnowed fingerprint
  * selection is a landing-time artifact
  * ([[graft.pipeline.CorpusWriter.writeWinnowIndex]], bucketed by
  * `fp`), and every arriving micro-batch reports each document's
  * seen-fingerprint fraction against it — the near-dup admission meter
  * with the MOSS guarantee bar (an arriving doc repeating ≥ w + n − 1
  * standing-corpus tokens MUST surface with n_seen ≥ 1), at ~2/(w+1)
  * of [[StreamNovelty]]'s per-gram probe volume.
  *
  * No state store; the index is frozen for the stream's lifetime, so
  * per-batch results are arrival-order independent and the union over
  * batches is BIT-equal to the batch replay on the same rows
  * (StreamWinnowSpec pins it). Per-batch work is increment-sized: one
  * tokenize+select scan, an fp join whose corpus side is the bucketed
  * exchange-free index scan. */
object StreamWinnow {

  /** Configure (not start) the admission meter: `docs` is a streaming
    * DataFrame carrying (idCol, textCol); `table` a
    * [[graft.pipeline.CorpusWriter.writeWinnowIndex]] sidecar; `sink`
    * receives each micro-batch's `(doc_id, n_selected, n_seen,
    * seen_frac)` rows and the batch id. */
  def admit(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, table: String, n: Int, w: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, frames) = graft.ops.Materialize.collecting {
          sink(Winnow.admitAgainstIndex(spark, table, batch, idCol,
            textCol, n, w), batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
