package graft.streaming

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
