package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.HyperLogLog

/** Streaming HLL: the steady-state register array is BIT-equal to the
  * batch sketch over the union of arrived rows — the one duality where
  * the STATE, not just the answer bounds, is arrival-order free. */
class StreamHllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multi-batch register state ≡ the batch sketch, register-for-register") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val expect = HyperLogLog.sketchOf(docs, "text")
    assert(expect.exists(_ > 0))

    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // deliberately uneven batches, reversed order: max doesn't care
    val parts = rows.grouped(math.max(1, (rows.length + 2) / 3)).toSeq.reverse

    val sketch = new StreamHll.Sketch
    var batches = 0L
    val input = MemoryStream[(Long, String)]
    val q = StreamHll.monitor(
        input.toDF().toDF("doc_id", "text"), "text", sketch) {
        (_, _) => batches += 1
      }
      .queryName("stream_hll_fixture_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()

    assert(batches >= parts.length)
    assert(sketch.registers.toSeq == expect.toSeq)
    assert(sketch.estimate == HyperLogLog.estimate(expect))
  }
}
