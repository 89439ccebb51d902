package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Paraphrase mining: the cross-signal bar — semantically near pairs
  * kept only when lexically far; near-dups (same text) excluded. */
class ParaphraseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Dim = 8

  /** Tiny corpus: doc 1 = doc 0's text reversed with an identical
    * embedding (paraphrase); doc 2 = doc 0 verbatim with an identical
    * embedding (near-dup); doc 3 = unrelated on both axes. */
  private def fixture = {
    import spark.implicits._
    val vA = Seq(0.9, 0.1, -0.3, 0.5, 0.2, -0.7, 0.4, 0.1)
    val vB = Seq(-0.6, 0.8, 0.1, -0.2, 0.5, 0.3, -0.9, 0.2)
    val tA = "the quick brown fox jumps over the lazy dog tonight"
    Seq(
      (0L, tA, vA),
      (1L, tA.split(' ').reverse.mkString(" "), vA),
      (2L, tA, vA),
      (3L, "completely different content about spark shuffles", vB)
    ).toDF("doc_id", "text", "emb")
  }

  test("reversed-text twin survives; verbatim twin is excluded") {
    import spark.implicits._
    val got = Paraphrase.minePairs(fixture, "doc_id", "text", "emb",
        Dim, minCos = 0.999, maxJac = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)), "paraphrase pair missing")
    assert(got.contains((1L, 2L)), "paraphrase pair vs the dup copy missing")
    assert(!got.contains((0L, 2L)), "verbatim near-dup must be barred")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      "semantically far doc must not pair")
  }

  test("jaccard and counts are exact on the planted pair") {
    import spark.implicits._
    val row = Paraphrase.minePairs(fixture, "doc_id", "text", "emb",
        Dim, minCos = 0.999, maxJac = 0.5)
      .filter(col("doc_a") === 0L && col("doc_b") === 1L)
      .select("n_a", "n_b", "n_shared", "jaccard", "cos")
      .as[(Long, Long, Long, Double, Double)].collect().head
    // 10 tokens -> 8 trigrams each; reversal shares none of them
    assert(row._1 == 8L && row._2 == 8L && row._3 == 0L)
    assert(row._4 == 0.0)
    assert(row._5 >= 0.999)
  }

  test("empty gram union reads jaccard 0.0 (short docs pass the bar)") {
    import spark.implicits._
    val v = Seq(1.0, 0.5, -0.5, 0.25, 0.1, -0.9, 0.3, 0.7)
    val tiny = Seq(
      (10L, "two words", v),
      (11L, "words two", v)
    ).toDF("doc_id", "text", "emb")
    val got = Paraphrase.minePairs(tiny, "doc_id", "text", "emb",
        Dim, minCos = 0.999, maxJac = 0.1)
      .select("doc_a", "doc_b", "n_a", "n_b", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((10L, 11L, 0L, 0L, 0.0)))
  }

  test("maxJac bar is inclusive and monotone") {
    import spark.implicits._
    // partial-overlap pair: rotate by one token -> shares most trigrams
    val v = Seq(0.4, -0.2, 0.8, 0.1, -0.5, 0.6, 0.2, -0.3)
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rot = (t.split(' ').drop(1) :+ t.split(' ').head).mkString(" ")
    val docs = Seq((20L, t, v), (21L, rot, v)).toDF("doc_id", "text", "emb")
    val jac = Paraphrase.minePairs(docs, "doc_id", "text", "emb",
        Dim, minCos = 0.999, maxJac = 1.0)
      .select("jaccard").as[Double].collect().head
    // 8 trigrams each, rotation keeps 7 shared -> 7/(8+8-7)
    assert(jac == 7.0 / 9.0)
    assert(Paraphrase.minePairs(docs, "doc_id", "text", "emb",
      Dim, minCos = 0.999, maxJac = 7.0 / 9.0).count() == 1)
    assert(Paraphrase.minePairs(docs, "doc_id", "text", "emb",
      Dim, minCos = 0.999, maxJac = 0.77).count() == 0)
  }
}
