package graft.ops

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DeadlineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("L3: a query past its wall-clock deadline is killed") {
    import spark.implicits._
    val slow = spark.range(0, 4, 1, 4).as[Long].mapPartitions { it =>
      Thread.sleep(30000); it
    }
    val t0 = System.nanoTime()
    intercept[SparkException] {
      Deadline.withDeadline(spark, seconds = 2)(slow.count())
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 20, s"kill switch took ${elapsed}s — not a prompt cancel")
  }

  test("a query inside its deadline completes normally") {
    val n = Deadline.withDeadline(spark, seconds = 60)(spark.range(100).count())
    assert(n == 100L)
  }
}
