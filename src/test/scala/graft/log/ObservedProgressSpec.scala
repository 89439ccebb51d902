package graft.log

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.QueryOptions

class ObservedProgressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observe-based progress reports consumed rows and high-water offset") {
    val opts = QueryOptions(bootstrapServers = "x", topics = Seq("events"))
    val base = LogQuery.consumed(spark, TestSpark.Sf, opts)
    val (df, obs) = LogQuery.observed(base, "progress_test")
    val n = df.count()
    val metrics = obs.get
    assert(metrics("rows_consumed") == n)
    assert(metrics("max_offset").asInstanceOf[Long] >= 0L)
  }
}
