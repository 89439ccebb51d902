package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.SkewReport

/** Streaming skew telemetry — [[SkewReport.keyProfile]] (q139) fed by a
  * stream, the THIRTEENTH batch/streaming duality: each micro-batch
  * contributes one counter-sized `(key, n)` frame, and the caller's
  * standing profile is [[SkewReport.profileFromCounts]] over the summed
  * counters — counts are additive, so the profile of the union is the
  * profile of the merged counters, batch-split-independent like every
  * additive monitor here ([[StreamFunnel]]'s discipline keyed by join
  * key instead of (source, stage)).
  *
  * This is the ingest half of the skew toolchain: a landing stream
  * keeps the per-key counters current, and the derived profile is
  * exactly what [[graft.ops.SaltedJoin.autoJoinWithProfile]] consumes —
  * the persisted-profile join (q153) running against live counts
  * instead of a one-shot measurement pass. Staleness is safe by
  * construction: salting is answer-invisible under ANY ≥1 fan-outs
  * (SaltedJoinSpec pins a deliberately wrong profile), so a lagging
  * profile costs balance, never correctness.
  *
  * No state store; per-batch work is one map-side-combined counter
  * aggregation over the batch. StreamSkewSpec pins merged counters ≡
  * the batch profile over the union. */
object StreamSkew {

  /** Configure (not start) the monitor: `df` is a streaming DataFrame;
    * `sink` receives each micro-batch's `(key, n)` counter rows and the
    * batch id — merge them by summing `n` per key, and derive the
    * standing profile with [[SkewReport.profileFromCounts]]. */
  def monitor(df: DataFrame, keyCol: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batch.groupBy(col(keyCol).as("key"))
          .agg(count(lit(1)).as("n")), batchId)
      }
}
