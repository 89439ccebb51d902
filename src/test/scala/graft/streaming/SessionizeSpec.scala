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

  test("idleTtl evicts a cold user's counts; a returning user starts over") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.concurrent.duration._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ProcessingTimeTimeout makes the engine schedule extra EMPTY
    // micro-batches to fire timeouts, so processAllAvailable is not a
    // usable barrier (it can block indefinitely) — poll the sink instead.
    def user1Rows(): Seq[(Long, Long)] = spark.table("sessionize_ttl_test")
      .filter(col("user_id") === 1L)
      .collect().toSeq.map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))
    def awaitUser1(n: Int): Seq[(Long, Long)] = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (user1Rows().length < n && System.nanoTime() < deadline)
        Thread.sleep(50)
      user1Rows()
    }

    val input = MemoryStream[(Long, Long)] // (user_id, epoch ms)
    val q = Sessionize.streamingCounts(input.toDS(), idleTtl = Some(100.millis))
      .toDF().writeStream
      .format("memory").queryName("sessionize_ttl_test")
      .outputMode("update").start()
    try {
      // Every emission for user 1 in this scenario is (1, 1), and TTL
      // eviction keeps firing ~100ms after each arrival — a further
      // timeout flush can append another (1, 1) row between any poll and
      // its assert, so assert CONTENT plus a lower bound, never exact
      // counts.
      input.addData((1L, 1000L))
      val first = awaitUser1(1)
      assert(first.nonEmpty && first.forall(_ == ((1L, 1L))), first.mkString(","))
      // Past the horizon the engine's timeout batches evict user 1,
      // FLUSHING their final (1, 1) — the second observable emission.
      val flushed = awaitUser1(2)
      assert(flushed.length >= 2 && flushed.forall(_ == ((1L, 1L))),
        flushed.mkString(","))
      // User 1 returns WITHIN GapMs of their old last event — without
      // eviction this would fold into the same session and emit (2, 1);
      // with state gone the counts start over, so every row stays (1, 1).
      input.addData((1L, 2000L))
      val rows = awaitUser1(3)
      assert(rows.length >= 3, rows.mkString(","))
      assert(rows.forall(_ == ((1L, 1L))), rows.mkString(","))
    } finally q.stop()
  }

  test("without idleTtl a long-idle user's counts accumulate (default contract)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long)]
    val q = Sessionize.streamingCounts(input.toDS())
      .toDF().writeStream
      .format("memory").queryName("sessionize_nottl_test")
      .outputMode("update").start()
    try {
      input.addData((1L, 1000L)); q.processAllAvailable()
      Thread.sleep(300)
      input.addData((1L, 2000L)); q.processAllAvailable()
      val last = spark.table("sessionize_nottl_test")
        .filter(col("user_id") === 1L)
        .collect().map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))
      assert(last.contains((2L, 1L)), last.mkString(","))
    } finally q.stop()
  }

  test("streamingCounts runs on the RocksDB state store — the corpus-scale backend") {
    // The second stateful operator gets the same backend proof as
    // StreamDedup: identical counts, rocksdb custom metrics present.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val q = Sessionize.streamingCounts(input.toDS())
      .toDF().writeStream
      .format("memory").queryName("sessionize_rocksdb_test")
      .outputMode("update").start()
    try {
      input.addData((1L, 1000L), (1L, 2000L), (2L, 1000L))
      q.processAllAvailable()
      val last = spark.table("sessionize_rocksdb_test")
        .filter(col("user_id") === 1L)
        .collect().map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions")))
      assert(last.contains((2L, 1L)), last.mkString(","))
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got ${metrics.keySet}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
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
