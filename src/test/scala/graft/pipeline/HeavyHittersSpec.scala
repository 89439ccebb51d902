package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: exact n-gram counts over a local corpus. */
  private def brute(texts: Seq[String], k: Int, n: Int): Seq[(String, Long)] = {
    val grams = texts.flatMap { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    }
    val total = grams.size.toLong
    grams.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * k > total }
      .sortBy { case (t, c) => (-c, t) }
  }

  test("skewed corpus: exact hitters survive the MG gate, tail dies") {
    // One dominant bigram, a mid hitter, and a 200-term tail — far more
    // distinct terms than MG counters, across many partitions.
    val texts =
      Seq.fill(120)("alpha beta") ++
        Seq.fill(40)("gamma delta") ++
        (0 until 200).map(i => s"tail$i tail${i}x")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(13)
    val k = 5 // threshold: > total/5 — only "alpha beta" qualifies
    val got = HeavyHitters.heavyHitters(docs, "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute(texts, k, 2))
    assert(got == Seq(("alpha beta", 120L)))
    // with a looser threshold (total 360, need > 30) the mid hitter
    // (40) appears too
    val got12 = HeavyHitters.heavyHitters(docs, "text", 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got12 == brute(texts, 12, 2))
    assert(got12.map(_._1).toSet == Set("alpha beta", "gamma delta"))
  }

  test("fixture corpus matches brute force (bigrams, k=800)") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = HeavyHitters.heavyHitters(docs, "text", 800)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute(texts, 800, 2))
    assert(got.nonEmpty)
  }

  test("unigrams and threshold edge: strict inequality") {
    // 4 grams of a, 4 of b; total 8; k=2 → need > 4: nobody qualifies
    val docs = Seq((0L, "a a a a b b b b")).toDF("doc_id", "text")
    assert(HeavyHitters.heavyHitters(docs, "text", 2, n = 1).count() == 0)
    // k=3 → need > 8/3 ≈ 2.67: both qualify
    val got = HeavyHitters.heavyHitters(docs, "text", 3, n = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 4L), ("b", 4L)))
  }
}
