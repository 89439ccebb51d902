package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream same-key interval join — the streaming counterpart of
  * [[graft.ops.IntervalJoin]] (q95): two unbounded event streams join
  * on a shared key within an event-time band, the Structured Streaming
  * "impressions ⋈ clicks" shape. Both sides carry watermarks and the
  * join condition bounds BOTH event times, so Spark's state store can
  * evict a row once the other side's watermark passes beyond its
  * possible match window — state is bounded by (delay + band), not by
  * the stream's history.
  *
  * Semantics note (pinned in StreamIntervalJoinSpec): an inner
  * stream-stream join emits exactly the batch join's matches as long as
  * each row's matches arrive within the watermark delay; rows arriving
  * later than the delay are dropped from state — the documented
  * streaming trade, demonstrated by the spec's aggressive-watermark
  * case. */
object StreamIntervalJoin {

  /** Configure the join over two event-shaped streaming frames
    * (`event_id`, `ts` TIMESTAMP, `user_id`): matched pairs
    * (user_id, id_a, id_b, ts_a, ts_b) with |ts_a − ts_b| ≤ `band`,
    * under `delay` watermarks on both sides. */
  def join(left: DataFrame, right: DataFrame, band: String,
      delay: String): DataFrame = {
    val l = left.withWatermark("ts", delay)
      .select(col("event_id").as("id_a"), col("ts").as("ts_a"),
        col("user_id"))
    val r = right.withWatermark("ts", delay)
      .select(col("event_id").as("id_b"), col("ts").as("ts_b"),
        col("user_id").as("user_b"))
    l.join(r, expr(
      s"""user_id = user_b AND
         |ts_a BETWEEN ts_b - INTERVAL $band AND ts_b + INTERVAL $band"""
        .stripMargin))
      .select(col("user_id"), col("id_a"), col("id_b"), col("ts_a"),
        col("ts_b"))
  }
}
