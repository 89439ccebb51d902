package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Clustering

/** Streaming ANN retrieval — [[Clustering.ivfTopKFromIndex]] (q137)
  * composed with the streaming front door, the ELEVENTH batch/streaming
  * duality and the serving shape of the stored IVF sidecar: the index
  * ([[graft.pipeline.CorpusWriter.writeIvfIndex]] + landings) is a
  * landing-time artifact, and every arriving micro-batch of QUERY
  * vectors probes it — top-k neighbors per query, partition-pruned to
  * each query's `nprobe` cells.
  *
  * No state store; the index is frozen for the stream's lifetime, so
  * per-batch results are arrival-order independent and the union over
  * batches is BIT-equal to the batch replay on the same query rows
  * (StreamAnnSpec pins it). Per-batch work is batch-sized on the query
  * side (the ≤ 1000-query broadcast contract applies PER MICRO-BATCH)
  * and pruned-cells-sized on the corpus side — the corpus is never
  * rescanned. */
object StreamAnn {

  /** Configure (not start) the retrieval stream: `queries` is a
    * streaming DataFrame carrying (idCol, embCol); `table` a
    * [[graft.pipeline.CorpusWriter.writeIvfIndex]] sidecar; `sink`
    * receives each micro-batch's `(qid, vec_id, cos, rn)` rows and the
    * batch id. */
  def probe(spark: SparkSession, queries: DataFrame, idCol: String,
      embCol: String, table: String, nprobe: Int, topK: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // An empty trigger carries no queries: nothing to probe (the
        // index path `require`s a nonempty batch, by design).
        if (!batch.isEmpty) {
          val (_, frames) = graft.ops.Materialize.collecting {
            sink(Clustering.ivfTopKFromIndex(spark, table, batch, idCol,
              embCol, nprobe, topK), batchId)
          }
          graft.ops.Materialize.release(frames)
        }
      }
}
