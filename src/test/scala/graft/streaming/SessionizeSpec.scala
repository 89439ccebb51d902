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
