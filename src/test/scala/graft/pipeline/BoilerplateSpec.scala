package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-source template detection: hand-built sources exercising the
  * within-source scoping, the relative bar, and the absolute floor. */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val header = "h1 h2 h3 h4 h5 h6 h7 h8"

  test("shared header flags within its source; unique tails don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$header u1 u2 u3 u4 u5 u6 u7 u8", "A"),
      (2L, s"$header v1 v2 v3 v4 v5 v6 v7 v8", "A"),
      (3L, s"$header w1 w2 w3 w4 w5 w6 w7 w8", "A"))
      .toDF("doc_id", "text", "source")
    val r = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
        "source", chunkTokens = 8, minDocs = 2, pct = 50)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r.values.forall(_ == ((2L, 1L, 0.5))))
  }

  test("the relative bar: 2-of-10 docs sharing a chunk is NOT template at pct=50") {
    import spark.implicits._
    val docs = (10L to 19L).map { i =>
      val tail = (1 to 8).map(j => s"t${i}_$j").mkString(" ")
      val text = if (i <= 11L) s"$header $tail" else tail
      (i, text, "C")
    }.toDF("doc_id", "text", "source")
    val r = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
        "source", chunkTokens = 8, minDocs = 2, pct = 50)
      .agg(sum("boiler_segments")).head.getLong(0)
    assert(r === 0L) // seg_df=2 < 50% of 10 docs
  }

  test("the absolute floor: a 2-doc source sharing everything needs minDocs ≤ 2") {
    import spark.implicits._
    val docs = Seq((1L, header, "B"), (2L, header, "B"))
      .toDF("doc_id", "text", "source")
    val flagged = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
        "source", chunkTokens = 8, minDocs = 2, pct = 50)
      .agg(sum("boiler_segments")).head.getLong(0)
    assert(flagged === 2L)
    val floored = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
        "source", chunkTokens = 8, minDocs = 3, pct = 50)
      .agg(sum("boiler_segments")).head.getLong(0)
    assert(floored === 0L)
  }

  test("within-source scoping: the same chunk in two SOURCES never flags") {
    import spark.implicits._
    val docs = Seq((1L, header, "A"), (2L, header, "B"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8", "A"), (4L, "y1 y2 y3 y4 y5 y6 y7 y8", "B"))
      .toDF("doc_id", "text", "source")
    val r = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
        "source", chunkTokens = 8, minDocs = 2, pct = 50)
      .agg(sum("boiler_segments")).head.getLong(0)
    assert(r === 0L)
  }

  test("fixture invariants: every tokenful doc reported, fractions in [0, 1]") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
      "source", chunkTokens = 8, minDocs = 2, pct = 8)
    assert(r.count() === docs.filter(length(trim(col("text"))) > 0).count())
    assert(r.filter(col("boiler_frac") < 0.0 || col("boiler_frac") > 1.0 ||
      col("boiler_segments") > col("n_segments")).count() === 0)
  }

  test("scrub drops exactly the template chunks, in document order") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$header u1 u2 u3 u4 u5 u6 u7 u8", "A"),
      (2L, s"u1 u2 u3 u4 u5 u6 u7 u8 $header", "A"),
      (3L, s"$header w1 w2 w3 w4 w5 w6 w7 w8", "A"))
      .toDF("doc_id", "text", "source")
    val r = Boilerplate.scrubTemplates(docs, "doc_id", "text", "source",
        chunkTokens = 8, minDocs = 2, pct = 50)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(2), x.getLong(3), x.getString(4))).toMap
    // header (3 docs) and the u-chunk (2 docs) both clear 50% of 3;
    // the w-tail is unique. Order survives: doc 2 had the u-chunk first.
    assert(r(1L) === ((2L, 2L, "")))
    assert(r(2L) === ((2L, 2L, "")))
    assert(r(3L) === ((2L, 1L, "w1 w2 w3 w4 w5 w6 w7 w8")))
  }

  test("scrub keeps fully-templated docs with empty text and agrees with the report") {
    import spark.implicits._
    val docs = Seq((1L, header, "B"), (2L, header, "B"),
      (3L, "k1 k2 k3 k4 k5 k6 k7 k8", "B"))
      .toDF("doc_id", "text", "source")
    val scrub = Boilerplate.scrubTemplates(docs, "doc_id", "text", "source",
      chunkTokens = 8, minDocs = 2, pct = 50)
    assert(scrub.count() === 3)
    assert(scrub.filter(col("doc_id") <= 2 && col("scrub_text") =!= "")
      .count() === 0)
    val rep = Boilerplate.sourceTemplateReport(docs, "doc_id", "text",
      "source", chunkTokens = 8, minDocs = 2, pct = 50)
      .select("doc_id", "n_segments", "boiler_segments")
    assert(scrub.select("doc_id", "n_segments", "boiler_segments")
      .except(rep).count() === 0)
  }
}
