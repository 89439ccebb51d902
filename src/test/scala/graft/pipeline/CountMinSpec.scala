package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-min commonness: hand-checked counts on a toy corpus, the
  * one-sided-error guarantee against the exact q72 scorer, and fixture
  * invariants. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("collision-free toy: estimates equal exact occurrence counts") {
    import spark.implicits._
    // 3 distinct tokens in 2^14 cells per slice — collisions would need
    // two of three 14-bit slices to agree; astronomically unlikely for
    // this fixed input, and the assert would catch it if it happened.
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val sketch = CountMin.buildSketch(docs, "text")
    val r = CountMin.commonnessReport(docs, "doc_id", "text", sketch)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // a=3, b=1, c=1 occurrences corpus-wide.
    assert(r(1L) === (3L, 3L + 3L + 1L))
    assert(r(2L) === (2L, 3L + 1L))
  }

  test("one-sided error: sketched sums never undercount the exact q72 sums") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val sketch = CountMin.buildSketch(docs, "text")
    val est = CountMin.commonnessReport(docs, "doc_id", "text", sketch)
      .select(col("doc_id"), col("sum_est"))
    val exact = TermCommonness.score(docs, "doc_id", "text")
      .select(col("doc_id"), col("sum_term_freq"))
    val joined = est.join(exact, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("sum_est") < col("sum_term_freq")).count() === 0)
  }

  test("fixture invariants: every tokenful doc scored, avg_est ≥ 1") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val sketch = CountMin.buildSketch(docs, "text")
    val r = CountMin.commonnessReport(docs, "doc_id", "text", sketch)
    assert(r.count() === docs.filter(length(trim(col("text"))) > 0).count())
    assert(r.filter(col("avg_est") < 1.0).count() === 0)
  }
}
