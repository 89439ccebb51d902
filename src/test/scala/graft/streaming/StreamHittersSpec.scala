package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming heavy hitters: the merged Misra–Gries summary keeps the
  * PODS'12 bounds across micro-batches — candidates are a superset of
  * the true heavy hitters of the full stream, counters never overcount
  * and undercount by at most N/(m+1), whatever the batch split. */
class StreamHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Exact bigram counts, locally. */
  private def exact(texts: Seq[String]): (Map[String, Long], Long) = {
    val grams = texts.flatMap { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    (grams.groupBy(identity).view.mapValues(_.size.toLong).toMap,
      grams.size.toLong)
  }

  private def drive(texts: Seq[String], m: Int, nBatches: Int): StreamHitters.Summary = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val summary = new StreamHitters.Summary(m)
    val input = MemoryStream[(Long, String)]
    var batches = 0
    val q = StreamHitters.admit(input.toDF().toDF("doc_id", "text"),
        "text", summary) { (_, _) => batches += 1 }
      .queryName(s"stream_hitters_test_${m}_$nBatches")
      .start()
    try {
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      rows.grouped(math.max(1, (rows.length + nBatches - 1) / nBatches))
        .foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
    assert(batches >= nBatches)
    summary
  }

  test("bounds + superset hold across batches on a skewed stream") {
    val texts =
      Seq.fill(150)("alpha beta") ++
        Seq.fill(50)("gamma delta") ++
        (0 until 300).map(i => s"tail$i tail${i}x")
    val (ex, n) = exact(texts)
    val k = 5 // hitters: count·5 > N — only "alpha beta" (150·5 > 500)
    Seq(1, 3, 7).foreach { nBatches =>
      val s = drive(texts, m = k, nBatches = nBatches)
      assert(s.total == n)
      // two-sided bound, term by term
      s.candidates.foreach { case (t, c) =>
        assert(c <= ex.getOrElse(t, 0L), s"overcount on $t")
        assert(ex(t) - c <= s.maxError, s"bound broken on $t")
      }
      // superset: every true hitter is tracked with a useful counter
      ex.filter { case (_, c) => c * k > n }.foreach { case (t, c) =>
        assert(s.count(t) >= c - s.maxError && s.count(t) > 0L,
          s"true hitter $t lost (count=${s.count(t)}, exact=$c)")
      }
    }
  }

  test("fixture stream: candidates cover the batch q98 answer") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val (ex, n) = exact(texts)
    val k = 800
    val s = drive(texts, m = k, nBatches = 4)
    assert(s.total == n)
    val trueHitters = ex.filter { case (_, c) => c * k > n }.keySet
    assert(trueHitters.nonEmpty)
    assert(trueHitters.subsetOf(s.candidates.keySet),
      s"missing: ${trueHitters -- s.candidates.keySet}")
  }
}
