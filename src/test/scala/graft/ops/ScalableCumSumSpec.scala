package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The scalable two-pass prefix sum must agree exactly with the window
  * derivation it replaces, for any partition count. */
class ScalableCumSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.withColumn("c", coalesce(sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq

  test("exclusive prefix sum ≡ window form across partition counts") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 5000L).map(k => (k, rnd.nextInt(1000).toLong))
      .toDF("k", "v")
    val expect = windowed(df)
    for (p <- Seq(1, 3, 8, 32)) {
      val got = ScalableCumSum.addCumSum(df, Seq("k"), "v", "c", p)
        .orderBy("k").select("k", "c").as[(Long, Long)].collect().toSeq
      assert(got == expect, s"numPartitions=$p")
    }
  }

  test("empty input and single row") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(ScalableCumSum.addCumSum(empty, Seq("k"), "v", "c", 4).count() == 0)
    val one = Seq((5L, 42L)).toDF("k", "v")
    assert(ScalableCumSum.addCumSum(one, Seq("k"), "v", "c", 4)
      .select("c").as[Long].collect().toSeq == Seq(0L))
  }

  test("grouped prefix sum ≡ per-group window form, incl. a hot group") {
    // Group "hot" holds 80% of rows — range partitions must cut through
    // it (the skew case the one-task-per-group window serializes on).
    val rnd = new scala.util.Random(11)
    val rows = (0L until 4000L).map { k =>
      val g = if (k % 5 != 0) "hot" else s"g${k % 7}"
      (g, k, rnd.nextInt(500).toLong)
    }
    val df = rows.toDF("g", "k", "v")
    val expect = df.withColumn("c", coalesce(sum("v").over(
        Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("g", "k").select("g", "k", "c")
      .as[(String, Long, Long)].collect().toSeq
    for (p <- Seq(1, 3, 8, 32)) {
      val got = ScalableRank.addGroupedCumSum(df, "g", Seq("k"), "v", "c", p)
        .orderBy("g", "k").select("g", "k", "c")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == expect, s"numPartitions=$p")
    }
  }
}
