package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus-frequency scoring: hand-computed expectations on a toy corpus,
  * and the structural invariants on the fixture. */
class TermCommonnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed toy corpus") {
    import spark.implicits._
    // vocab: a=3 (2 in doc 1, 1 in doc 2), b=1, c=1
    val docs = Seq((1L, "a A b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TermCommonness.score(docs, "doc_id", "text").collect()
    assert(r.length === 2)
    val d1 = r(0); val d2 = r(1)
    assert(d1.getLong(0) === 1L && d1.getLong(1) === 3L && d1.getLong(2) === 7L)
    assert(d1.getDouble(3) === 7.0 / 3.0) // bit-exact: one IEEE division
    assert(d2.getLong(0) === 2L && d2.getLong(1) === 2L && d2.getLong(2) === 4L)
    assert(d2.getDouble(3) === 2.0)
  }

  test("fixture invariants: every doc scored, avg ≥ 1, shared terms raise it") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = TermCommonness.score(docs, "doc_id", "text")
    assert(r.count() === docs.filter(length(trim(col("text"))) > 0).count())
    // Each token occurs at least once corpus-wide (itself).
    assert(r.filter(col("avg_term_freq") < 1.0).count() === 0)
    // The fixture's shared vocabulary means real commonness, not all-1s.
    assert(r.filter(col("avg_term_freq") > 1.0).count() > 0)
  }
}
