package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.CorpusWriter

/** Streaming DELETES — the removal half [[StreamLanding]]'s ingest half
  * pairs with (r17): a takedown/expiry stream must stop being served
  * without waiting for a rewrite window.
  *
  *  - Retrieval indexes (SQ8/IVF/IVF-PQ): each micro-batch of retired
  *    ids lands as TOMBSTONES ([[CorpusWriter.appendTombstones]] — an
  *    O(batch) append); every stored-index probe anti-joins standing
  *    tombstones, so a delete is un-servable from its batch commit on;
  *    the periodic `apply*Tombstones` rewrite is a COST knob, not a
  *    correctness one (probe ≡ post-apply bit-for-bit, TombstoneSpec).
  *  - Trigram LM: counts are ADDITIVE, so the delete stream needs no
  *    tombstones at all — each micro-batch subtract-lands its negated
  *    counts ([[CorpusWriter.retireFromLmModel]], O(batch)); the
  *    reader's sum + zero-skip nets the deleted docs out exactly.
  *
  * Arrival-order independence: tombstone rows are a SET under the
  * readers' distinct (duplicates harmless), and LM subtract landings
  * commute (integer addition), so any batch split and ordering yields
  * the same served answers. */
object StreamRetire {

  /** Configure (not start) tombstone landing for a stored index:
    * `ids` is a streaming DataFrame carrying `idCol`. */
  def intoTombstones(spark: SparkSession, ids: DataFrame, idCol: String,
      table: String)(onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    ids.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          CorpusWriter.appendTombstones(spark, table, batch, idCol)
        onBatch(batchId)
      }

  /** Configure (not start) the LM delete stream: each micro-batch of
    * retired TRAINING DOCS subtract-lands its counts. */
  def fromLmModel(spark: SparkSession, docs: DataFrame, textCol: String,
      table: String)(onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val (_, frames) = graft.ops.Materialize.collecting {
            CorpusWriter.retireFromLmModel(batch, textCol, table)
          }
          graft.ops.Materialize.release(frames)
        }
        onBatch(batchId)
      }
}
