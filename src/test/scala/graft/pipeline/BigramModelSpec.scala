package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bigram LM scoring: hand-computed expectations on a toy corpus, the
  * order-sensitivity property that motivates the op over q72, and the
  * structural invariants on the fixture. */
class BigramModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed toy corpus") {
    import spark.implicits._
    // doc 1 bigrams: "a b"×2, "b a"×1; doc 2: "a b"×1, "b c"×1.
    // c2: "a b"=3, "b a"=1, "b c"=1; c1: a=3, b=2.
    // p_fp: "a b"=2^20, "b a"=2^19, "b c"=2^19.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = BigramModel.score(docs, "doc_id", "text").collect()
    assert(r.length === 2)
    val d1 = r(0); val d2 = r(1)
    assert(d1.getLong(0) === 1L && d1.getLong(1) === 3L)
    assert(d1.getLong(2) === 2L * 1048576L + 524288L)
    assert(d1.getDouble(3) === 2621440.0 / 3145728.0)
    assert(d1.getLong(4) === 1L) // "b a" is doc 1's alone
    assert(d2.getLong(0) === 2L && d2.getLong(1) === 2L)
    assert(d2.getLong(2) === 1048576L + 524288L)
    assert(d2.getDouble(3) === 0.75)
    assert(d2.getLong(4) === 1L) // "b c" is doc 2's alone
  }

  test("order sensitivity: a scrambled copy scores no higher than its original") {
    import spark.implicits._
    // Same unigram bag, reversed order — q72 scores these identically;
    // the bigram model must not score the scramble ABOVE the original
    // (the original's transitions are reinforced by the clean twin).
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "mat the on sat cat the")).toDF("doc_id", "text")
    val r = BigramModel.score(docs, "doc_id", "text")
      .select("doc_id", "avg_cond_prob").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(3L) < r(1L))
  }

  test("fixture invariants: every multi-token doc scored, probs in (0, 1]") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = BigramModel.score(docs, "doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val eligible = docs.filter(
      size(graft.functions.GraftFunctions.wordGrams(col("text"), 2)) > 0)
    assert(r.count() === eligible.count())
    assert(r.filter(col("avg_cond_prob") <= 0.0 ||
      col("avg_cond_prob") > 1.0).count() === 0)
    // The fixture's shared vocabulary means real transition mass, and its
    // duplicate clusters mean not every doc is novelty-free.
    assert(r.agg(max("novel_grams")).head.getLong(0) > 0L)
  }
}
