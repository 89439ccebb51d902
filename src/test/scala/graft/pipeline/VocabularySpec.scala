package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Vocabulary + OOV: hand-computed toy expectations, the deterministic
  * tie-break at the V boundary, and fixture invariants. */
class VocabularySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed toy corpus") {
    import spark.implicits._
    // counts: a=3, b=2, c=1, d=1 → V=2 vocab {a, b}; doc 2 has 2 OOV of 4.
    val docs = Seq((1L, "a b a"), (2L, "A b c d")).toDF("doc_id", "text")
    val r = Vocabulary.oovReport(docs, "doc_id", "text", v = 2).collect()
    assert(r.length === 2)
    assert(r(0).getLong(0) === 1L && r(0).getLong(1) === 3L &&
      r(0).getLong(2) === 0L && r(0).getDouble(3) === 0.0)
    assert(r(1).getLong(0) === 2L && r(1).getLong(1) === 4L &&
      r(1).getLong(2) === 2L && r(1).getDouble(3) === 0.5)
  }

  test("V boundary ties resolve lexicographically (count desc, term asc)") {
    import spark.implicits._
    // b and c tie at count 1; V=2 must pick {a, b}, never {a, c}.
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = Vocabulary.oovReport(docs, "doc_id", "text", v = 2).collect()
    // doc 2 = [a, c]: c is OOV under {a, b}.
    assert(r(1).getLong(2) === 1L)
  }

  test("fixture invariants: rates in [0,1], V past the vocab means zero OOV") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = Vocabulary.oovReport(docs, "doc_id", "text", v = 512)
    assert(r.filter(col("oov_rate") < 0.0 || col("oov_rate") > 1.0).count() === 0)
    assert(r.filter(col("oov_tokens") > col("n_tokens")).count() === 0)
    // A vocabulary bigger than the corpus's distinct term count covers
    // everything.
    val all = Vocabulary.oovReport(docs, "doc_id", "text", v = 1000000)
    assert(all.filter(col("oov_tokens") =!= 0L).count() === 0)
  }
}
