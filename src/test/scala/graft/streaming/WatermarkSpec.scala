package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Event-time watermarking: append-mode tumbling aggregation emits a
  * window only once its watermark passes, and data arriving later than
  * the allowed lateness is dropped — the discipline that bounds state for
  * an unbounded 100 TB stream. */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming dedup within watermark drops replayed event ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (event_id, epoch ms)
    val deduped = input.toDF().toDF("event_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val h = 3600L * 1000
      input.addData((1L, h), (2L, h + 1000), (1L, h + 2000)) // in-batch dup
      q.processAllAvailable()
      input.addData((2L, h + 3000), (3L, h + 4000)) // cross-batch dup
      q.processAllAvailable()
      input.addData((9L, h + 7200000)) // advance watermark, flush state
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_test").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L, 9L))
    } finally q.stop()
  }

  test("late rows beyond the watermark are dropped; closed windows are final") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Double)] // (epoch-ms event time, value)
    val agg = input.toDF().toDF("ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(unix_millis(col("window.start")).as("bucket_ms"), col("n"), col("sum_value"))

    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val h = 3600L * 1000 // t0 at an hour boundary
      // Batch 1: two rows in bucket [t0, t0+10m), one in the next bucket.
      input.addData((h, 1.0), (h + 60000, 2.0), (h + 600000, 4.0))
      q.processAllAvailable()
      // Batch 2: advance event time far past the first buckets — the
      // watermark moves to (max event time - 10m), closing them.
      input.addData((h + 3600000, 8.0))
      q.processAllAvailable()
      // Batch 3: a LATE row for the long-closed first bucket → dropped.
      input.addData((h + 30000, 100.0))
      q.processAllAvailable()
      // Batch 4: push the watermark further so any state flushes.
      input.addData((h + 7200000, 16.0))
      q.processAllAvailable()

      val out = spark.table("wm_test")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // First bucket emitted with ONLY the two on-time rows.
      assert(out(h) == (2L, 3.0), out)
      // Second bucket intact.
      assert(out(h + 600000) == (1L, 4.0), out)
      // The late row created no new emission and updated nothing.
      assert(out.values.map(_._2).sum == 3.0 + 4.0 + out.getOrElse(h + 3600000, (0L, 0.0))._2)
    } finally q.stop()
  }
}
