package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Snapshot diff: planted add/remove/edit classification, absence of
  * unchanged ids, and the q76 registration's predicate arithmetic on
  * the fixture. */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted versions classify exactly; unchanged ids are absent") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma edited"), (4L, "delta")).toDF("doc_id", "text")
    val got = CorpusDiff.diff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("q76 fixture split: statuses match the generating predicates") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = graft.SparkEntry.queries("q76_corpus_diff")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = ids.flatMap { id =>
      if (id % 17 == 3) Some(id -> "added")        // absent from v1
      else if (id % 17 == 5) Some(id -> "removed") // absent from v2
      else if (id % 13 == 0) Some(id -> "changed") // edited in v2
      else None
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty && got.values.toSet == Set("added", "removed", "changed"))
  }
}
