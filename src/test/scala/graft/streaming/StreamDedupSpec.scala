package graft.streaming

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming ingest dedup: first sight emits, duplicates stay silent
  * across micro-batch boundaries, and the final kept set agrees with the
  * batch replay of the same input. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("first occurrence emits once; later-batch duplicates emit nothing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long)] // (fp, doc_id)
    val q = StreamDedup.firstSeen(input.toDS()).toDF().writeStream
      .format("memory").queryName("stream_dedup_test")
      .outputMode("append").start()
    try {
      // Batch 1: fp 100 twice (lowest id wins within the batch), fp 200 once.
      input.addData((100L, 12L), (100L, 10L), (200L, 11L))
      q.processAllAvailable()
      val afterB1 = spark.table("stream_dedup_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB1 == Set((100L, 10L), (200L, 11L)))

      // Batch 2: fp 100 AGAIN (cross-batch duplicate — state must
      // remember), plus new fp 300.
      input.addData((100L, 13L), (300L, 14L))
      q.processAllAvailable()
      val afterB2 = spark.table("stream_dedup_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB2 == Set((100L, 10L), (200L, 11L), (300L, 14L)))
    } finally q.stop()
  }

  test("out-of-order arrival: later-batch LOWER id emits nothing; kept id diverges from batch min") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long)]
    val q = StreamDedup.firstSeen(input.toDS()).toDF().writeStream
      .format("memory").queryName("stream_dedup_ooo_test")
      .outputMode("append").start()
    try {
      // Batch 1 sees fp 100 with id 50; batch 2 delivers a LOWER id 10
      // for the same fingerprint — the non-ascending arrival the object
      // scaladoc's caveat describes.
      input.addData((100L, 50L)); q.processAllAvailable()
      input.addData((100L, 10L), (200L, 60L)); q.processAllAvailable()
      val streamed = spark.table("stream_dedup_ooo_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // (a) No second emission: the surviving-fingerprint set matches the
      // batch replay of the union — one kept row per fingerprint.
      val batchKept = StreamDedup
        .batch(Seq((50L, "A"), (10L, "A"), (60L, "B")).toDF("doc_id", "t")
          .selectExpr("doc_id", "t AS text"), "doc_id", "text")
      assert(streamed.map(_._1) == Set(100L, 200L))
      assert(streamed.size == 2)
      // (b) The documented kept-id divergence: streaming keeps the first
      // SEEN id 50, batch replay keeps min(doc_id) = 10.
      assert(streamed == Set((100L, 50L), (200L, 60L)))
      assert(batchKept.collect().map(_.getLong(1)).toSet == Set(10L, 60L))
    } finally q.stop()
  }

  /** Poll the memory sink until `expect` holds of the emitted (fp, id)
    * set — with ProcessingTimeTimeout the engine schedules extra EMPTY
    * micro-batches to fire timeouts, so `processAllAvailable` is not a
    * usable barrier (it can block indefinitely); observing the sink is. */
  private def awaitSink(table: String)(expect: Set[(Long, Long)] => Boolean): Set[(Long, Long)] = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var got = Set.empty[(Long, Long)]
    while ({ got = spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      !expect(got) && System.nanoTime() < deadline }) Thread.sleep(50)
    got
  }

  /** Await the admission→eviction state sequence — a progress batch
    * reporting `numRowsTotal == 1` (the fingerprint admitted) followed
    * by a LATER batch reporting 0 (the TTL eviction) — the OBSERVABLE
    * eviction signal. Scans `recentProgress` (the engine's bounded
    * history), not `lastProgress`: the 1-row admission batch is
    * transient, and if the eviction batch lands before the first poll
    * observes it, a lastProgress poll for 1 would spin its full timeout
    * even though the 1→0 sequence actually occurred (ADVICE r10). The
    * 0 must come AFTER the 1 in history order — a pre-data batch's
    * zero-row progress must not satisfy the drain wait. */
  private def awaitAdmitThenDrain(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def states: Seq[Long] = q.recentProgress.toSeq
      .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
    def ok: Boolean = {
      val s = states
      val i = s.indexOf(1L)
      i >= 0 && s.drop(i + 1).contains(0L)
    }
    while (!ok && System.nanoTime() < deadline) Thread.sleep(50)
    assert(ok, s"state never admitted 1 row then drained to 0: $states")
  }

  test("ttl evicts idle fingerprints; re-arrival past the horizon is re-admitted") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.concurrent.duration._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long)]
    val q = StreamDedup.firstSeen(input.toDS(), ttl = Some(100.millis))
      .toDF().writeStream
      .format("memory").queryName("stream_dedup_ttl_test")
      .outputMode("append").start()
    try {
      input.addData((100L, 10L))
      assert(awaitSink("stream_dedup_ttl_test")(_ == Set((100L, 10L)))
        == Set((100L, 10L)))
      // Wall clock passes the horizon; the engine's timeout batches evict
      // fp 100. Eviction emits nothing to the sink, so observe it where
      // it IS visible — the state row count going 1 (admission) then 0
      // (drain) in progress-history order, so neither a pre-data batch's
      // zero-row progress nor an eviction landing before the first poll
      // can satisfy the wait spuriously.
      awaitAdmitThenDrain(q)
      input.addData((200L, 20L))
      assert(awaitSink("stream_dedup_ttl_test")(_.contains((200L, 20L)))
        .contains((200L, 20L)))
      // fp 100's state is gone (observed above, BEFORE fp 200 arrived) —
      // this duplicate is RE-ADMITTED (the documented TTL trade) and
      // emits with its own id.
      input.addData((100L, 30L))
      val streamed = awaitSink("stream_dedup_ttl_test")(_.contains((100L, 30L)))
      assert(streamed == Set((100L, 10L), (200L, 20L), (100L, 30L)))
    } finally q.stop()
  }

  test("without ttl a long-idle fingerprint still deduplicates (default contract)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long)]
    val q = StreamDedup.firstSeen(input.toDS()).toDF().writeStream
      .format("memory").queryName("stream_dedup_nottl_test")
      .outputMode("append").start()
    try {
      input.addData((100L, 10L)); q.processAllAvailable()
      Thread.sleep(300)
      input.addData((100L, 30L)); q.processAllAvailable()
      val streamed = spark.table("stream_dedup_nottl_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((100L, 10L)))
    } finally q.stop()
  }

  test("firstSeen runs on the RocksDB state store — the corpus-scale state backend") {
    // TTL bounds state growth in TIME; RocksDB bounds it in SPACE (state
    // lives off-heap and spills to local disk instead of executor heap —
    // the production backend once fingerprint state outgrows memory).
    // Same semantics, different provider; rocksdb custom metrics in the
    // progress event prove the provider actually engaged.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val q = StreamDedup.firstSeen(input.toDS()).toDF().writeStream
      .format("memory").queryName("stream_dedup_rocksdb_test")
      .outputMode("append").start()
    try {
      input.addData((100L, 12L), (100L, 10L), (200L, 11L))
      q.processAllAvailable()
      input.addData((100L, 13L), (300L, 14L))
      q.processAllAvailable()
      val streamed = spark.table("stream_dedup_rocksdb_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((100L, 10L), (200L, 11L), (300L, 14L)))
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got ${metrics.keySet}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("the built-in dropDuplicatesWithinWatermark covers the event-time-bounded variant") {
    // The scaladoc's built-in-first claim, proven: when duplicates are
    // bounded in EVENT time, Spark's own operator deduplicates with no
    // custom state code — firstSeen earns its keep only for unbounded
    // arrival, the kept-id row shape, and processing-time TTL.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Long, Long)] // (fp, doc_id, event ms)
    val h = 7200L * 1000
    val q = input.toDF().toDF("fp", "doc_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .writeStream.format("memory")
      .queryName("stream_dedup_builtin_test")
      .outputMode("append").start()
    try {
      // Batch 1: fp 100 twice within the window + fp 200.
      input.addData((100L, 12L, h), (100L, 10L, h + 1000), (200L, 11L, h))
      q.processAllAvailable()
      // Batch 2: fp 100 again inside the watermark window → suppressed.
      input.addData((100L, 13L, h + 2000), (300L, 14L, h + 3000))
      q.processAllAvailable()
      val fps = spark.table("stream_dedup_builtin_test")
        .collect().map(_.getAs[Long]("fp")).toSet
      assert(fps == Set(100L, 200L, 300L))
      assert(spark.table("stream_dedup_builtin_test").count() == 3)
    } finally q.stop()
  }

  test("streaming kept set ≡ batch replay on the documents fixture") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val batchKept = StreamDedup.batch(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Feed the same (fp, doc_id) pairs in two halves, in ingest (id)
    // order — batch keeps the global-min id, streaming the first SEEN,
    // and the two coincide exactly when arrival follows id order.
    graft.functions.GraftFunctions.register(spark)
    val pairs = docs.selectExpr("rolling_hash(text) AS fp",
        "CAST(doc_id AS LONG) AS doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._2)
    val (h1, h2) = pairs.splitAt(pairs.length / 2)
    val input = MemoryStream[(Long, Long)]
    val q = StreamDedup.firstSeen(input.toDS()).toDF().writeStream
      .format("memory").queryName("stream_dedup_fixture_test")
      .outputMode("append").start()
    try {
      input.addData(h1); q.processAllAvailable()
      input.addData(h2); q.processAllAvailable()
      val streamed = spark.table("stream_dedup_fixture_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchKept)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
