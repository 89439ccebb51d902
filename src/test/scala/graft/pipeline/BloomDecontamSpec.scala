package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom decontamination semantics: acceptance never undercounts the
  * exact overlap (q42), zero-hit docs are present (annotation form), and
  * the filter's set-bit table respects its fixed size bound. */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val evalPred = col("doc_id") % 97 === 0
  private lazy val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")

  test("bloom acceptance is a superset of exact overlap, per doc") {
    val bloom = BloomDecontam.bloomReport(docs, "doc_id", "text", evalPred, n = 4)
      .select(col("doc_id"), col("n_bloom_hits"))
    val exact = Decontam.overlapReport(docs, "doc_id", "text", evalPred, n = 4)
    val under = exact.join(bloom, "doc_id")
      .filter(col("n_bloom_hits") < col("n_overlap"))
    assert(under.count() === 0,
      "a Bloom filter cannot reject a gram that IS in the eval set")
    // The exact-overlap docs all surface as hits (no lost contamination).
    assert(exact.count() > 0, "fixture must have true overlap to test against")
  }

  test("every non-eval doc with ≥1 gram appears, zero hits included") {
    val bloom = BloomDecontam.bloomReport(docs, "doc_id", "text", evalPred, n = 4)
    val expected = docs.filter(!evalPred)
      .filter(size(split(trim(col("text")), "\\s+")) >= 4).count()
    assert(bloom.count() === expected)
    assert(bloom.filter(col("n_grams") <= 0).count() === 0)
    assert(bloom.filter(col("n_bloom_hits") > col("n_grams")).count() === 0)
  }

  test("a planted eval gram is accepted in a corpus doc that contains it") {
    import spark.implicits._
    val planted = Seq(
      (0L, "held out marker alpha beta gamma delta secret"), // eval (0 % 2 == 0)
      (1L, "unrelated filler marker alpha beta gamma delta words here"), // contains eval 4-gram
      (3L, "completely different tokens nothing shared at all ok")
    ).toDF("doc_id", "text")
    val r = BloomDecontam.bloomReport(planted, "doc_id", "text",
        col("doc_id") % 2 === 0, n = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) >= 1L, "doc 1 shares 'marker alpha beta gamma' (+ more) with eval")
    assert(r(3L) === 0L, "doc 3 shares nothing; slices make chance acceptance of " +
      "all 3 positions vanishingly unlikely on a near-empty filter")
  }
}
