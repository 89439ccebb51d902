package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Batch-perceptron training: convergence on a separable toy frame, a
  * hand-walked round-1 update, and the fixture invariants. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Toy frame shaped so the "the"-count feature (f4) separates the
    * labels perfectly: en docs say "the", others never do. */
  private def toyDocs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat.", "en", 23L),
      (2L, "the dog and the bird.", "en", 21L),
      (3L, "der hund und die katze.", "de", 23L),
      (4L, "le chat est dans la maison.", "fr", 27L))
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  test("round 1 from zero weights sums every document's signed features") {
    // w=0 → every y·(w·x)=0 ≤ 0 → w1 = Σ yᵢxᵢ. Check the bias weight's
    // fingerprint: 2 positives + 2 negatives → a0 = 0, so round-1 scores
    // depend only on the text features (f1..f4), and the en docs (the
    // only ones with f4 > 0) must outscore the others.
    val r = QualityClassifier.trainAndScore(toyDocs, "doc_id", "lang",
      "text", "n_chars", posLang = "en", rounds = 1).collect()
    assert(r.length === 4)
    val scores = r.map(row => row.getLong(0) -> row.getLong(2)).toMap
    assert(scores(1L) > scores(3L) && scores(2L) > scores(4L))
  }

  test("perceptron separates a linearly separable toy corpus") {
    val r = QualityClassifier.trainAndScore(toyDocs, "doc_id", "lang",
      "text", "n_chars", posLang = "en", rounds = 8).collect()
    // Classic perceptron guarantee: finitely many mistakes on separable
    // data; 8 rounds is far past convergence for this 4-row frame.
    r.foreach { row =>
      assert(row.getLong(3) === row.getLong(1),
        s"doc ${row.getLong(0)} predicted ${row.getLong(3)} but label ${row.getLong(1)}")
    }
  }

  test("training is deterministic: two runs agree bit-for-bit") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    def run() = QualityClassifier.trainAndScore(docs, "doc_id", "lang",
      "text", "n_chars", posLang = "en", rounds = 4)
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("fixture: every document scored once, both labels present") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = QualityClassifier.trainAndScore(docs, "doc_id", "lang",
      "text", "n_chars", posLang = "en", rounds = 4)
    assert(r.count() === docs.count())
    assert(r.select("doc_id").distinct().count() === docs.count())
    val labels = r.select("y").distinct().collect().map(_.getLong(0)).toSet
    assert(labels === Set(1L, -1L))
  }

  test("rounds bound is enforced") {
    intercept[IllegalArgumentException] {
      QualityClassifier.trainAndScore(toyDocs, "doc_id", "lang", "text",
        "n_chars", posLang = "en", rounds = 0)
    }
  }
}
