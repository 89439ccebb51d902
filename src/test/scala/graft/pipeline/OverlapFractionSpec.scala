package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contamination fraction: hand-computed toy, consistency with the
  * report form, and the annotation-form completeness invariants. */
class OverlapFractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed toy: fraction and flag") {
    import spark.implicits._
    // Eval doc 100 = "a b c d e" → 2 distinct 4-grams {a b c d, b c d e}.
    // Doc 1 repeats "a b c d" inside 6 tokens → grams {a b c d, b c d a,
    // c d a b, d a b c}? No — doc 1 = "a b c d a b c d": 5 distinct
    // 4-grams, of which "a b c d" hits. Doc 2 shares nothing.
    val docs = Seq(
      (100L, "a b c d e"),
      (1L, "a b c d a b c d"),
      (2L, "x y z w v u")).toDF("doc_id", "text")
    val r = Decontam.overlapFraction(docs, "doc_id", "text",
        evalPred = col("doc_id") === 100L, n = 4, tau = 0.2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4))).toMap
    assert(r.keySet === Set(1L, 2L))
    val (ng1, no1, f1, c1) = r(1L)
    assert(ng1 === 4L && no1 === 1L && f1 === 0.25 && c1)
    val (ng2, no2, f2, c2) = r(2L)
    assert(ng2 === 3L && no2 === 0L && f2 === 0.0 && !c2)
  }

  test("consistency with the report form: same matched docs, same counts") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val frac = Decontam.overlapFraction(docs, "doc_id", "text",
        col("doc_id") % 97 === 0, n = 4, tau = 0.05)
      .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
    val report = Decontam.overlapReport(docs, "doc_id", "text",
        col("doc_id") % 97 === 0, n = 4)
      .as[(Long, Long)].collect().toMap
    // Every reported doc appears with the identical overlap count; every
    // unreported doc annotates as zero.
    report.foreach { case (id, n) => assert(frac(id) === n, s"doc $id") }
    frac.foreach { case (id, n) =>
      if (!report.contains(id)) assert(n === 0L, s"doc $id")
    }
  }

  test("eval-leak report: planted leak attributes exactly") {
    import spark.implicits._
    // Eval doc 0: tokens a..f → three 4-grams. Corpus doc 10 contains
    // "a b c d" (the first gram); doc 11 shares nothing; doc 12 repeats
    // the SAME leaked gram (second sharing doc, same gram).
    val docs = Seq(
      (0L, "a b c d e f"),
      (10L, "x y a b c d z"),
      (11L, "p q r s t u"),
      (12L, "a b c d w1 w2")).toDF("doc_id", "text")
    val r = Decontam.evalLeakReport(docs, "doc_id", "text",
      evalPred = col("doc_id") === 0L, n = 4).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === 0L)
    assert(row.getLong(1) === 3L) // n_grams
    assert(row.getLong(2) === 1L) // n_leaked: only "a b c d"
    assert(row.getLong(3) === 2L) // docs 10 and 12
    assert(row.getDouble(4) === 1.0 / 3.0)
  }

  test("eval-leak report: fixture invariants") {
    val docs = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
    val evalPred = col("doc_id") % 97 === 0
    val r = Decontam.evalLeakReport(docs, "doc_id", "text", evalPred, n = 4)
    assert(r.count() === docs.filter(evalPred).count())
    assert(r.filter(col("n_leaked") > col("n_grams") ||
      col("leak_frac") < 0.0 || col("leak_frac") > 1.0).count() === 0)
  }

  test("annotation completeness: every non-eval doc with ≥4 tokens present") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    graft.functions.GraftFunctions.register(spark)
    val expected = docs.filter(col("doc_id") % 97 =!= 0)
      .filter(size(graft.functions.GraftFunctions.wordGrams(col("text"), 4)) > 0)
      .count()
    val r = Decontam.overlapFraction(docs, "doc_id", "text",
      col("doc_id") % 97 === 0, n = 4, tau = 0.05)
    assert(r.count() === expected)
    assert(r.filter(col("overlap_frac") < 0 || col("overlap_frac") > 1)
      .count() === 0)
  }
}
