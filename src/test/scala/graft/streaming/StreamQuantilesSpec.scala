package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamQuantiles.Grid

/** Streaming quantile telemetry: merged per-batch histograms are
  * bit-equal to the batch histogram of the union, brackets contain the
  * exact percentile, and out-of-range values clamp to edge buckets. */
class StreamQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val grid = Grid(0.0, 1024.0, 4096)

  test("multi-batch merge ≡ one batch histogram; brackets contain exact percentiles") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = graft.core.Tables.load(spark, TestSpark.Sf, "events")
    val values = events.select("value").collect().map(_.getDouble(0)).toSeq
    val want = StreamQuantiles.histogram(events, "value", grid)

    val parts = values.grouped(math.max(1, (values.length + 2) / 3)).toSeq
    val merged = Array.fill(grid.buckets)(0L)
    val input = MemoryStream[Double]
    val q = StreamQuantiles.monitor(input.toDF().toDF("value"), "value", grid) {
        (h, _) => h.indices.foreach(i => merged(i) += h(i))
      }
      .queryName("stream_quantiles_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()

    assert(parts.length === 3)
    assert(merged.toSeq === want.toSeq)
    assert(merged.sum === values.length.toLong)

    // Brackets: the exact percentile under the engine's floor(p(n-1))
    // rule lies within the reported bucket bounds.
    val sorted = values.sorted
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val exact = sorted(math.floor(p * (sorted.length - 1)).toInt)
      val (lo, hi) = StreamQuantiles.bracket(merged, p, grid)
      assert(exact >= lo && exact < hi, s"p=$p exact=$exact not in [$lo,$hi)")
      assert(hi - lo === grid.width)
    }
  }

  test("out-of-range values clamp into the edge buckets") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 1023.9, 5000.0).toDF("value")
    val h = StreamQuantiles.histogram(df, "value", grid)
    assert(h(0) === 2L)               // -5 clamps down, 0.0 lands in [0, w)
    assert(h(grid.buckets - 1) === 2L) // 1023.9 in last bucket; 5000 clamps
    assert(h.sum === 4L)
  }
}
