package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hot keys, shares, and salt fan-outs are exact") {
    // 7×a, 3×b, 2×c, total 12; target 2 → a hot (salts 4), b hot (2).
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = SkewReport.keyProfile(df, "k", targetRowsPerTask = 2L)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2),
        x.getInt(3))).toSeq
    assert(r == Seq(("a", 7L, 7.0 / 12.0, 4), ("b", 3L, 3.0 / 12.0, 2)))
  }

  test("boundary: n == target is NOT hot; n == target+1 gets salts 2") {
    val df = (Seq.fill(4)("x") ++ Seq.fill(5)("y")).toDF("k")
    val r = SkewReport.keyProfile(df, "k", targetRowsPerTask = 4L)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(3))).toSeq
    assert(r == Seq(("y", 5L, 2)))
  }

  test("plan: counter-sized — no corpus-wide window, total broadcasts") {
    val events = graft.core.Tables.load(spark, TestSpark.Sf, "events")
    val df = SkewReport.keyProfile(events, "event_type", 100L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }
}
