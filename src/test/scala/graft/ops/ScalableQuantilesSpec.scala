package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.CorpusStats

/** Radix selection: equivalence with the sort-window form (q53) on the
  * fixture and on adversarial toys — single-row groups, all-equal
  * values, rank boundaries — plus the contract errors. */
class ScalableQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("fixture equivalence: radix ≡ sort-window q53, across repartitions") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val expect = rows(CorpusStats.lengthReport(docs, "lang", "n_chars"))
    assert(expect.nonEmpty)
    for (p <- Seq(1, 7)) {
      val got = rows(ScalableQuantiles.orderStatistics(docs.repartition(p),
          "lang", "n_chars", CorpusStats.Percentiles)
        .withColumnRenamed("total", "total_chars"))
      assert(got == expect, s"repartition=$p")
    }
  }

  test("adversarial toys: single-row group, all-equal group, dense boundary ranks") {
    import spark.implicits._
    val df = (Seq(("solo", 7L)) ++
      (1 to 50).map(_ => ("same", 13L)) ++
      (0 until 100).map(i => ("dense", i.toLong)))
      .toDF("g", "v")
    val ps = Seq(0.0 -> "p0", 0.29 -> "p29", 0.5 -> "p50", 1.0 -> "p100")
    val r = ScalableQuantiles.orderStatistics(df, "g", "v", ps)
      .collect().map(x => x.getString(0) ->
        (x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    assert(r("solo") === (7L, 7L, 7L, 7L))
    assert(r("same") === (13L, 13L, 13L, 13L))
    // dense: n=100 → index floor(p·99); 0.29·99 = 28.709…99 in doubles —
    // whatever double floor gives, the sort rule and the radix rule must
    // agree because both use the identical multiply.
    val idx29 = math.floor(0.29 * 99.0).toLong
    assert(r("dense") === (0L, idx29, 49L, 99L))
  }

  test("contract errors: value out of range, too many groups") {
    import spark.implicits._
    val big = Seq(("g", 1L << 40)).toDF("g", "v")
    val e1 = intercept[IllegalArgumentException] {
      ScalableQuantiles.orderStatistics(big, "g", "v", Seq(0.5 -> "p50"))
    }
    assert(e1.getMessage.contains("outside"))
    val wide = (0 until 20).map(i => (s"g$i", 1L)).toDF("g", "v")
    val e2 = intercept[IllegalArgumentException] {
      ScalableQuantiles.orderStatistics(wide, "g", "v",
        Seq(0.5 -> "p50"), maxGroups = 10)
    }
    assert(e2.getMessage.contains("facet"))
  }
}
