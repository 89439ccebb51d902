package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val probeSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType), StructField("pt", LongType)))
  private val buildSchema = StructType(Seq(
    StructField("k", StringType), StructField("bt", LongType), StructField("v", StringType)))

  test("attaches latest build row at or before probe time, per key") {
    val probe = spark.createDataFrame(java.util.List.of(
      Row(1L, "a", 10L), Row(2L, "a", 25L), Row(3L, "a", 5L), Row(4L, "b", 50L)),
      probeSchema)
    val build = spark.createDataFrame(java.util.List.of(
      Row("a", 10L, "a@10"), Row("a", 20L, "a@20"), Row("b", 60L, "b@60")),
      buildSchema)
    val out = AsofJoin.asof(probe, build, key = "k", probeTime = "pt",
        buildTime = "bt", tieBreak = "v", attach = Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out(1L) == "a@10") // equal time counts ("<=")
    assert(out(2L) == "a@20") // latest earlier build row
    assert(out(3L) == null)   // nothing at or before t=5
    assert(out(4L) == null)   // b's only build row is later
  }

  test("ties at (key, time) break by max tieBreak, deterministically") {
    val probe = spark.createDataFrame(java.util.List.of(Row(1L, "a", 10L)), probeSchema)
    val build = spark.createDataFrame(java.util.List.of(
      Row("a", 10L, "first"), Row("a", 10L, "zlast")), buildSchema)
    val out = AsofJoin.asof(probe, build, "k", "pt", "bt", "v", Seq("v")).collect()
    assert(out.head.getAs[String]("v") == "zlast")
  }
}
