package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Stateful sessionization: the mapGroupsWithState streaming form must
  * agree with the batch window form on final per-user counts. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming mapGroupsWithState counts ≡ batch sessionization") {
    val batch = Sessionize.batch(Tables.load(spark, TestSpark.Sf, "events"))
      .groupBy("user_id")
      .agg(sum("n_events").as("n_events"), count(lit(1)).as("n_sessions"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))
      .toMap

    val streamed = Sessionize.replayCounts(spark, TestSpark.Sf, "sessionize_replay_test")
      .collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))
      .toMap

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("flatMapGroupsWithState emits closed sessions by gap AND by timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = Sessionize.GapMs
    val h = 7200L * 1000

    val input = MemoryStream[(Long, Long)] // (user_id, epoch ms)
    val sessions = Sessionize.closedSessions(
      input.toDF().toDF("user_id", "ts_ms")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .select("user_id", "ts"))
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("closed_sessions_test")
      .outputMode("append").start()
    try {
      // user 1: two events in one session.
      input.addData((1L, h), (1L, h + 60000))
      q.processAllAvailable()
      // user 1 again, far past the gap → closes session 1 by DATA arrival.
      input.addData((1L, h + gap * 4))
      q.processAllAvailable()
      // user 2 far in the future pushes the watermark past user 1's open
      // session + gap → session 2 closes by TIMEOUT.
      input.addData((2L, h + gap * 40))
      q.processAllAvailable()
      input.addData((2L, h + gap * 41)) // one more batch so timeouts fire
      q.processAllAvailable()

      val out = spark.table("closed_sessions_test")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ms"),
          r.getAs[Long]("n_events"))).toSet
      assert(out.contains((1L, h, 2L)), out) // closed by gap
      assert(out.contains((1L, h + gap * 4, 1L)), out) // closed by timeout
    } finally q.stop()
  }

  test("gap semantics: a gap greater than GapMs opens a new session") {
    import spark.implicits._
    val gap = Sessionize.GapMs
    val events = Seq(
      (0L, 1L, 0L, 1.0), (1L, 1L, 1000L, 1.0), // session 1: two events
      (2L, 1L, 1000L + gap + 1, 1.0), // session 2 (gap exceeded)
      (3L, 2L, 0L, 1.0)) // other user
      .toDF("event_id", "user_id", "ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val out = Sessionize.batch(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_no"), r.getAs[Long]("n_events")))
    assert(out.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
