package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.TrigramModel

/** Streaming LM quality scoring — [[TrigramModel]] (q154/q155) composed
  * with the streaming front door, the FOURTEENTH batch/streaming
  * duality: the trigram model is a landing-time artifact
  * ([[graft.pipeline.CorpusWriter.writeLmModel]], bucketed counts kept
  * current by append landings), and every arriving micro-batch of
  * documents scores against it — the CCNet crawl-side deployment, where
  * the reference LM trains rarely and the crawl never stops.
  *
  * No state store; the model is frozen for the stream's lifetime, so
  * per-batch results are arrival-order independent and the union over
  * batches is BIT-equal to [[TrigramModel.scoreFromModel]] over the
  * same rows (StreamLmSpec pins the replay). Per-batch work is
  * batch-sized on the document side (one tokenize scan into (doc,
  * trigram) counts) and vocabulary-keyed on the model side (the five
  * bucketed lookup joins). */
object StreamLm {

  /** Configure (not start) the scorer: `docs` is a streaming DataFrame
    * carrying (idCol, textCol); `table` a
    * [[graft.pipeline.CorpusWriter.writeLmModel]] sidecar; `sink`
    * receives each micro-batch's [[TrigramModel.scoreFromModel]] rows
    * and the batch id. */
  def score(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, table: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, frames) = graft.ops.Materialize.collecting {
          sink(TrigramModel.scoreFromModel(batch, idCol, textCol,
            spark.table(table)), batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
