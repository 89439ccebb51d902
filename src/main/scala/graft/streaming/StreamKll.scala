package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.KllSketch

/** Streaming KLL quantiles — [[StreamQuantiles]]' unbounded-domain
  * sibling (VERDICT r16 #5): the fixed grid needs a known [lo, hi)
  * contract and answers bucket-width brackets; the KLL sketch needs no
  * range and answers any quantile with ε·n rank error. Per micro-batch
  * one partition-parallel sketch builds ([[KllSketch.ofColumn]] — only
  * O(k log n) summaries move) and the caller folds it into a running
  * sketch with [[KllSketch.merge]] — the [[StreamHitters]]
  * mergeable-summary pattern at quantile grain. StreamKllSpec pins the
  * rank-error bound across batch splits and arrival orders; the exact
  * pass (q96's radix selection) remains the audit-time answer. */
object StreamKll {

  /** Configure (not start) the monitor: `sink` receives each
    * micro-batch's sketch and the batch id; the caller merges. */
  def monitor(docs: DataFrame, valueCol: String, k: Int,
      seed: Long = 0x6b6c6cL)(
      sink: (KllSketch, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(KllSketch.ofColumn(batch, valueCol, k, seed + batchId), batchId)
      }
}
