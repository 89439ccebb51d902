package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Funnel

/** Streaming curation-funnel telemetry — [[Funnel.report]] (q138) per
  * arriving micro-batch, the TWELFTH batch/streaming duality: each
  * batch's per-(source, stage) survival counters flow to the sink, and
  * the caller's standing funnel is their element-wise SUM — additive
  * merge is exactly what [[Funnel]]'s row-local stage flags buy
  * (language ID, quality, repetition are pure per-document predicates,
  * so a document's attribution is batch-independent and counters
  * commute across any batch split; the one NON-row-local batch stage,
  * dedup-canonical, is deliberately absent here — its flag depends on
  * the whole corpus, which is [[StreamDedup]]'s first-wins territory).
  *
  * No state store; per-batch work is one narrow scan + a counter-sized
  * aggregation ([[StreamQuantiles]]' merge discipline, keyed by
  * (source, stage) instead of bucket). StreamFunnelSpec pins the summed
  * stream ≡ the batch funnel over the union. */
object StreamFunnel {

  /** Configure (not start) the monitor: `docs` is a streaming DataFrame
    * carrying (`srcCol`, the stage predicates' input columns); `stages`
    * are (name, row-local boolean Column) in pipeline order (e.g.
    * [[Funnel.rowLocalStageCols]]); `sink` receives each micro-batch's
    * `(source, stage_idx, stage, entered, passed)` counter rows and the
    * batch id — merge them by summing `entered`/`passed` per
    * (source, stage_idx, stage). */
  def monitor(docs: DataFrame, srcCol: String,
      stages: Seq[(String, Column)])(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val flagged = batch.select(col(srcCol).as("source") +:
          stages.map { case (name, c) => c.as(name) }: _*)
        sink(Funnel.report(flagged, "source", stages.map(_._1)), batchId)
      }
  }
}
