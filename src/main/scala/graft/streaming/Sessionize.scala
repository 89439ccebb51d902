package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Sessionization — the canonical stateful operator a log-analytics engine
  * needs (SURVEY §2.6 "stateful ops"): group a user's events into sessions
  * separated by ≥ `GapMs` of inactivity.
  *
  * Two implementations of the SAME semantics:
  *  - [[batch]]: lag + running sum of session-break flags over a keyed
  *    window — one shuffle, SQL-expressible, DuckDB-oracle-checked (q29);
  *  - [[streamingCounts]]: `mapGroupsWithState` keeping per-user running
  *    state across micro-batches — the Structured Streaming form, asserted
  *    against the batch result under Trigger.AvailableNow.
  */
object Sessionize {
  val GapMs: Long = 30 * 60 * 1000

  /** Batch sessionization: (user_id, sess_no) summary rows. */
  def batch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > GapMs, 1).otherwise(0))
      .withColumn("sess_no",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_no")
      .agg(min(unix_millis(col("ts"))).as("session_start_ms"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy("user_id", "sess_no")
  }

  /** DuckDB oracle for [[batch]] on table `events`. */
  val batchOracleSql: String =
    s"""WITH x AS (
       |  SELECT user_id, ts, event_id, "value",
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events),
       |y AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |    OR epoch_ms(ts) - epoch_ms(prev_ts) > $GapMs THEN 1 ELSE 0 END AS new_sess
       |  FROM x),
       |z AS (
       |  SELECT *, CAST(sum(new_sess) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
       |  FROM y)
       |SELECT user_id, sess_no, min(epoch_ms(ts)) AS session_start_ms,
       |  count(*) AS n_events,
       |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM z GROUP BY user_id, sess_no ORDER BY user_id, sess_no""".stripMargin

  /** Per-user running state carried across micro-batches. */
  case class UserState(nEvents: Long, nSessions: Long, lastTsMs: Long)
  case class UserCounts(user_id: Long, n_events: Long, n_sessions: Long)

  /** Streaming per-user session/event counts via mapGroupsWithState.
    * Events within one micro-batch group are sorted by event time before
    * folding, so AvailableNow replay is deterministic.
    *
    * State is one [[UserState]] per DISTINCT user forever by default —
    * at 100 TB of ingest that unbounded growth is the scale bound of
    * this path (the [[StreamDedup.firstSeen]] contract). `idleTtl`, when
    * set, evicts a user idle for that much PROCESSING time (clock resets
    * on every sighting); the evicted user's final counts are flushed as
    * one last emission (idempotent for update-mode consumers that keep
    * the max per key, e.g. [[replayCounts]]), and a later return starts
    * the counts OVER — the documented trade for bounded state. Default
    * off: q29's replay semantics are the no-TTL contract. Same
    * operational note as [[StreamDedup.firstSeen]]: a processing-time
    * timeout makes the engine schedule extra empty micro-batches. */
  def streamingCounts(events: Dataset[(Long, Long)],
      idleTtl: Option[scala.concurrent.duration.FiniteDuration] = None): Dataset[UserCounts] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_._1)
      .mapGroupsWithState[UserState, UserCounts](timeoutConf) {
        (user: Long, it: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserCounts(user, s.nEvents, s.nSessions)
          } else {
            var s = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue))
            it.toSeq.sortBy(_._2).foreach { case (_, tsMs) =>
              val newSession = s.nEvents == 0L || tsMs - s.lastTsMs > GapMs
              s = UserState(s.nEvents + 1, s.nSessions + (if (newSession) 1 else 0), tsMs)
            }
            state.update(s)
            idleTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
            UserCounts(user, s.nEvents, s.nSessions)
          }
      }
  }

  final case class SessionOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** Closed-session EMITTER: `flatMapGroupsWithState` in Append mode with
    * an EVENT-TIME timeout — the production shape of streaming
    * sessionization. A session closes either when a later event arrives
    * past the gap (emitted immediately) or when the watermark passes
    * `last event + gap` with no new data (emitted by timeout), so state
    * size stays bounded by the number of OPEN sessions.
    *
    * Input df needs columns `user_id` (long), `ts` (timestamp — a
    * watermark is applied here), and emits one row per closed session.
    */
  def closedSessions(df: DataFrame, watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import df.sparkSession.implicits._
    val typed = df
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp])
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp)], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startMs, s.lastMs, s.n))
          } else {
            val times = it.map(_._2.getTime).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.lastMs <= GapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, s.startMs, s.lastMs, s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Run [[streamingCounts]] over the events fixture under AvailableNow;
    * returns the FINAL per-user counts (last update per key). */
  def replayCounts(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      name: String): DataFrame = {
    import spark.implicits._
    val raw = StreamingLog.eventsStream(spark, sfDir)
      .select(col("user_id").as[Long], unix_millis(col("ts")).as[Long])
    val counted = streamingCounts(raw.as[(Long, Long)])
    val q = counted.toDF().writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update mode emits one row per key per micro-batch; the final state is
    // the last emission. With AvailableNow over one directory this is one
    // batch, but keep the reduction general.
    spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"), col("s.n_sessions").as("n_sessions"))
  }
}
