package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Curriculum ordering: NTILE band parity with Spark's own window ntile,
  * the band-then-draw total order, permutation/band-contiguity
  * invariants, and partitioning-independence. */
class CurriculumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bands match window ntile exactly (fixture, 7 buckets)") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = Curriculum.order(docs, "doc_id", "n_chars", buckets = 7)
    val w = Window.orderBy(col("n_chars"), col("doc_id"))
    val want = docs.select(col("doc_id"),
      ntile(7).over(w).as("bucket_w"))
    val joined = got.join(want, "doc_id")
    assert(joined.filter(col("bucket") =!= col("bucket_w")).count() === 0)
  }

  test("pos is a 1..n permutation ordered by (bucket, draw, doc_id)") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = Curriculum.order(docs, "doc_id", "n_chars", buckets = 5)
      .collect()
    val n = got.length
    assert(got.map(_.getLong(3)).sorted.toSeq === (1L to n).toSeq)
    // All of band b precedes all of band b+1.
    val byPos = got.sortBy(_.getLong(3)).map(_.getInt(2))
    assert(byPos.toSeq === byPos.sorted.toSeq)
  }

  test("uneven split follows NTILE: n=10, B=3 gives bands of 4,3,3") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, i * 10)).toDF("doc_id", "diff")
    val got = Curriculum.order(docs, "doc_id", "diff", buckets = 3)
    val sizes = got.groupBy("bucket").count().orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq === Seq((1, 4L), (2, 3L), (3, 3L)))
    // Band 1 holds the 4 easiest (smallest difficulty) docs.
    val b1 = got.filter(col("bucket") === 1).collect().map(_.getLong(0)).sorted
    assert(b1.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("more buckets than rows degenerates to one row per band") {
    import spark.implicits._
    val docs = (1L to 3L).map(i => (i, 100L - i)).toDF("doc_id", "diff")
    val got = Curriculum.order(docs, "doc_id", "diff", buckets = 8)
      .collect()
    // Difficulty descends with doc_id, so band order inverts doc order.
    assert(got.map(r => (r.getLong(0), r.getInt(2))).toSeq ===
      Seq((1L, 3), (2L, 2), (3L, 1)))
  }

  test("partitioning-independent: 1 vs 13 partitions, same order") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val a = Curriculum.order(docs.repartition(1), "doc_id", "n_chars", 5)
      .collect().map(_.toSeq)
    val b = Curriculum.order(docs.repartition(13), "doc_id", "n_chars", 5)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
