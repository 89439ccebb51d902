package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Approximate aggregates — the sketches a 100 TB profiler reaches for
  * when exact distinct/percentile would shuffle the world. Accuracy is
  * asserted against the exact answers on the fixture. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct (HLL++) within 5% of exact") {
    val li = Tables.load(spark, TestSpark.Sf, "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("percentile_approx brackets the exact median") {
    val li = Tables.load(spark, TestSpark.Sf, "lineitem")
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val exact = r.getAs[Double]("exact")
    val approx = r.getAs[Double]("approx")
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
