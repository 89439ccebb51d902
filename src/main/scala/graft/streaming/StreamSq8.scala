package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.ScalarQuant

/** Streaming SQ8 retrieval — [[ScalarQuant]] (q156/q165) composed with
  * the streaming front door, the FIFTEENTH batch/streaming duality and
  * the landed SQ8 index's serving shape ([[StreamAnn]]'s pattern at
  * flat-index grain): each arriving micro-batch of QUERY vectors lifts
  * in-session and probes the frozen stored codes under the frozen
  * stored grid. No state store; per-batch work is batch-sized on the
  * query side (the ≤1000-query broadcast contract applies per
  * micro-batch) and one codes scan on the corpus side; arrival-order
  * independent, so the union over batches is BIT-equal to
  * [[ScalarQuant.sq8TopKFromIndex]] over the same rows (StreamSq8Spec
  * pins the replay). */
object StreamSq8 {

  /** Configure (not start) the prober: `queries` is a streaming
    * DataFrame carrying (idCol, embCol); `table` a
    * [[graft.pipeline.CorpusWriter.writeSq8Index]] sidecar; `sink`
    * receives each micro-batch's (qid, vec_id, score, rn) rows and the
    * batch id. */
  def probe(spark: SparkSession, queries: DataFrame, idCol: String,
      embCol: String, table: String, dim: Int, topK: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val (_, frames) = graft.ops.Materialize.collecting {
            sink(ScalarQuant.sq8TopKFromIndex(spark, table, batch, idCol,
              embCol, dim, topK), batchId)
          }
          graft.ops.Materialize.release(frames)
        }
      }
}
