package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class ShardPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("greedy fill: shard = floor(start offset / budget), shards contiguous") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
      .toDF("doc_id", "text")
    // tokens: 3, 2, 4, 1 → starts 0, 3, 5, 9 → budget 4 → shards 0, 0, 1, 2
    val got = ShardPack.assign(docs, "doc_id",
        expr("size(split(text, ' '))"), budget = 4L, numPartitions = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L), (2L, 2L, 0L), (3L, 4L, 1L), (4L, 1L, 2L)))
  }

  test("fixture packing: shards are budget-bounded at their start and dense") {
    val budget = 1000L
    val packed = ShardPack.assign(
      Tables.load(spark, TestSpark.Sf, "documents"), "doc_id",
      TextStats.tokenCount(col("text")), budget).cache()
    val shards = packed.groupBy("shard").agg(sum("n_tokens").as("toks"))
      .orderBy("shard").as[(Long, Long)].collect().toSeq
    assert(shards.nonEmpty)
    // shard ids are 0..max with no gaps (greedy fill never skips)
    assert(shards.map(_._1) == (0L until shards.length.toLong))
    // every shard except the last started before its budget boundary, so
    // each holds ≥ 1 doc; total tokens conserved
    val total = packed.agg(sum("n_tokens")).as[Long].head()
    assert(shards.map(_._2).sum == total)
    packed.unpersist()
  }
}
