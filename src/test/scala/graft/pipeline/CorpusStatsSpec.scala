package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact order-statistic percentiles: hand-computed indices on a tiny
  * corpus, the every-value-exists property, and partitioning
  * invariance. */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("percentiles are the values at floor(p·(n−1)), 0-based") {
    // lang "a": lengths 10..100 (n=10). Indices: p10 → floor(.1·9)=0 →
    // 10; p50 → floor(4.5)=4 → 50; p90 → floor(8.1)=8 → 90; p99 →
    // floor(8.91)=8 → 90.
    val docs = (1 to 10).map(i => ("a", i * 10L)) :+ (("b", 7L))
    val got = CorpusStats.lengthReport(docs.toDF("lang", "n_chars"),
      "lang", "n_chars").collect()
    val a = got.find(_.getString(0) == "a").get
    assert((a.getLong(1), a.getLong(2)) == ((10L, 550L)))
    assert((a.getLong(3), a.getLong(4), a.getLong(5), a.getLong(6)) ==
      ((10L, 50L, 90L, 90L)))
    // A single-doc language reports that doc's length at every p.
    val b = got.find(_.getString(0) == "b").get
    assert((b.getLong(3), b.getLong(4), b.getLong(5), b.getLong(6)) ==
      ((7L, 7L, 7L, 7L)))
  }

  test("every reported percentile is a value present in that language") {
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val byLang = fixture.select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    CorpusStats.lengthReport(fixture, "lang", "n_chars").collect().foreach { r =>
      val vals = byLang(r.getString(0))
      (3 to 6).foreach(i => assert(vals.contains(r.getLong(i)), r))
    }
  }

  test("result is invariant to input partitioning") {
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.lengthReport(df, "lang", "n_chars").collect().map(_.toString).toSeq
    assert(run(fixture.repartition(13)) == run(fixture.coalesce(1)))
  }

  test("overlap matrix ≡ fp-keyed self-join mirror on the fixture") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = CorpusStats.overlapMatrix(docs, "source", "text", n = 3)
      .as[(String, String, Long)].collect().toSeq
    val mirror = CorpusStats.joinOverlapMatrix(docs, "source", "text", n = 3)
      .as[(String, String, Long)].collect().toSeq
    assert(got == mirror)
    assert(got.nonEmpty)
    // Pairs are unordered-canonical (a < b) and counts positive.
    assert(got.forall { case (a, b, c) => a < b && c > 0 })
  }

  test("overlap matrix is invariant under input partitioning") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.overlapMatrix(df, "source", "text", n = 3)
        .collect().map(_.toString).toSeq
    assert(run(docs.repartition(13)) == run(docs.coalesce(1)))
  }

  test("overlap matrix ≡ join mirror on randomized corpora") {
    // Random fragment-composed docs over random source assignments:
    // covers sharing shapes (grams in 1, some, all sources) no fixture
    // fixes, including sources with zero shared grams (absent rows).
    val frags = IndexedSeq(
      "alpha beta gamma delta epsilon", "zeta eta theta iota kappa",
      "lambda mu nu xi omicron", "pi rho sigma tau upsilon",
      "phi chi psi omega alef")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 60).map { i =>
        val text = Seq.fill(1 + rnd.nextInt(3))(frags(rnd.nextInt(frags.length)))
          .mkString(" ")
        (s"s${rnd.nextInt(6)}", text)
      }.toDF("source", "text").repartition(7)
      val got = CorpusStats.overlapMatrix(docs, "source", "text", n = 3)
        .collect().map(_.toString).toSeq
      val mirror = CorpusStats.joinOverlapMatrix(docs, "source", "text", n = 3)
        .collect().map(_.toString).toSeq
      assert(got == mirror, s"seed=$seed")
    }
  }

  test("a gram shared past maxSources raises the contract error") {
    // Three sources all containing one identical sentence: the common
    // gram's cell holds 3 sources, over a maxSources of 2.
    val docs = Seq(("s1", "the same exact boilerplate line"),
        ("s2", "the same exact boilerplate line"),
        ("s3", "the same exact boilerplate line"))
      .toDF("source", "text")
    val e = intercept[Exception] {
      CorpusStats.overlapMatrix(docs, "source", "text", n = 3,
        maxSources = 2).collect()
    }
    assert(e.getMessage.contains("maxSources"), e.getMessage)
  }
}
