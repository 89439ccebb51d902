package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Novelty

/** Streaming novelty scoring — [[Novelty]] (q106/q107) composed with
  * the streaming front door, the EIGHTH batch/streaming duality: the
  * corpus's distinct-gram index is a landing-time artifact
  * ([[graft.pipeline.CorpusWriter.writeGramIndex]], bucketed by
  * `gram_fp`), and every arriving micro-batch reports each document's
  * novel-gram fraction against it. The ingest twin of
  * [[StreamDrift]]: drift watches the DISTRIBUTION of a batch, novelty
  * scores its CONTENT — together they are the "is this crawl worth
  * admitting" dashboard.
  *
  * No state store; the index is frozen for the stream's lifetime, so
  * per-batch results are arrival-order independent and the union over
  * batches is BIT-equal to [[Novelty.noveltyAgainstIndex]] over the
  * same rows (StreamNoveltySpec pins the replay). Per-batch work is
  * increment-sized: one tokenize scan, a gram join whose corpus side
  * is the bucketed index scan. */
object StreamNovelty {

  /** Configure (not start) the scorer: `docs` is a streaming DataFrame
    * carrying (idCol, textCol); `table` a
    * [[graft.pipeline.CorpusWriter.writeGramIndex]] sidecar; `sink`
    * receives each micro-batch's `(doc_id, n_grams, novel_grams,
    * novelty_frac)` rows and the batch id. */
  def score(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, table: String, n: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, frames) = graft.ops.Materialize.collecting {
          sink(Novelty.noveltyAgainstIndex(spark, table, batch, idCol,
            textCol, n), batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
