package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixed-point importance scoring: hand-computed weights on a tiny
  * corpus, target-affinity ordering on the fixture, and partitioning
  * invariance (integer sums cannot depend on partition order). */
class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weights are the fixed-point add-one ratio, scores their exact sums") {
    val docs = Seq(
      (0L, "t", "x x y"),
      (1L, "c", "x y z"),
      (2L, "c", "z z")
    ).toDF("doc_id", "kind", "text")
    val got = Importance.affinityScores(docs, "doc_id", "text",
        col("kind") === "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val S = Importance.Scale
    // tc/cc: x → 2/3, y → 1/2, z → 0/3.
    val wx = (2 + 1) * S / (3 + 1)
    val wy = (1 + 1) * S / (2 + 1)
    val wz = (0 + 1) * S / (3 + 1)
    assert(got == Seq((1L, 3L, wx + wy + wz), (2L, 2L, 2 * wz)))
  }

  test("docs sharing the target language's vocabulary outscore others (per token)") {
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val scored = Importance.affinityScores(fixture, "doc_id", "text",
        col("lang") === "en")
      .join(fixture.select("doc_id", "lang"), "doc_id")
    val byLang = scored
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(sum(score) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)").as("per_tok"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Shared latin-script function words give es/fr/de SOME affinity;
    // zh shares almost no tokens with the English target slice.
    assert(!byLang.contains("en")) // target slice never scored
    assert(byLang("zh") < byLang("es") && byLang("zh") < byLang("fr") &&
      byLang("zh") < byLang("de"), byLang.toString)
  }

  test("selectTop returns the n best per stratum, equal to the window form") {
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = Importance.selectTop(fixture, "doc_id", "text", "lang",
        col("lang") === "en", n = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Exact mirror: full scores ranked by a plain window.
    val scores = Importance.affinityScores(fixture, "doc_id", "text",
        col("lang") === "en")
      .join(fixture.select(col("doc_id"), col("lang")), "doc_id")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score")))
    val expect = scores.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy { case (_, id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((l, id, s), i) => (l, id, s, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect)
    assert(got.nonEmpty && !got.exists(_._1 == "en"))
  }

  test("result is invariant to input partitioning") {
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      Importance.affinityScores(df, "doc_id", "text", col("lang") === "en")
        .collect().map(_.toString).toSeq
    assert(run(fixture.repartition(11)) == run(fixture.coalesce(1)))
  }
}
