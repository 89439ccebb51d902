package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{CorpusWriter, Winnow}

/** Streaming winnow admission: the union of per-batch reports against
  * the frozen fingerprint index is BIT-equal to the batch replay. */
class StreamWinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type Rec = (Long, Long, Long, Double)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Rec] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("multi-batch admission ≡ the batch replay against the same index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val pred = col("doc_id") % 7 === 0
    val tbl = "graft_test_stream_winnow_idx"
    CorpusWriter.writeWinnowIndex(docs.filter(!pred), "doc_id", "text",
      n = 4, w = 4, tbl, buckets = 8)
    try {
      val expect = rows(Winnow.admitAgainstIndex(spark, tbl,
        docs.filter(pred), "doc_id", "text", n = 4, w = 4))
      assert(expect.nonEmpty)
      assert(expect.exists(_._3 > 0L), "fixture increment shares fps")

      val incRows = docs.filter(pred).select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
      val parts = incRows.grouped(math.max(1, (incRows.length + 2) / 3)).toSeq
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Rec)]
      val input = MemoryStream[(Long, String)]
      val q = StreamWinnow.admit(spark,
          input.toDF().toDF("doc_id", "text"), "doc_id", "text", tbl,
          n = 4, w = 4) {
          (rep, batchId) => rows(rep).foreach(r => got += batchId -> r)
        }
        .queryName("stream_winnow_fixture_test")
        .start()
      try {
        parts.foreach { p => input.addData(p); q.processAllAvailable() }
      } finally q.stop()

      assert(parts.length === 3)
      assert(got.map(_._2).toSet === expect,
        s"extra=${got.map(_._2).toSet -- expect} " +
          s"missing=${expect -- got.map(_._2).toSet}")
      assert(got.size === expect.size)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_meta")
    }
  }
}
