package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Multimodal

/** Streaming content-ID: micro-batched probes replay the batch verdicts
  * bit-for-bit, and a streamed frame-index landing grows the reference
  * set identically to the batch chain. */
class StreamContentIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drop(ts: String*): Unit =
    ts.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private lazy val assets = Multimodal.plantedAssets(
    graft.core.Tables.load(spark, TestSpark.Sf, "documents"))

  test("multi-batch probes ≡ the batch replay against the same index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tbl = "graft_test_cid_idx"
    drop(tbl, s"${tbl}_meta")
    Multimodal.writeFrameIndex(assets.filter(col("asset_id") < 10000),
      tbl, buckets = 8)
    val probes = assets.filter(col("asset_id") >= 10000)
    val want = Multimodal.contentIdAgainstIndex(spark, tbl, probes,
        minShared = 2)
      .collect().map(_.mkString("|")).toSeq.sorted
    val rows = probes.collect().toSeq.sortBy(_.asset_id)
    val parts = (0 until 3).map(r => rows.filter(_.asset_id % 3 == r))
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val input = MemoryStream[Multimodal.MediaAsset]
    val q = StreamContentId.probe(spark, input.toDF(), tbl, minShared = 2) {
        (df, _) => got ++= df.collect().map(_.mkString("|"))
      }
      .queryName("stream_content_id_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
    assert(got.toSeq.sorted == want)
    drop(tbl, s"${tbl}_meta")
  }

  test("streamed frame-index landing ≡ the batch write+append union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = assets.filter(col("asset_id") < 10000)
    val a = base.filter(col("asset_id") % 2 === 0)
    val b = base.filter(col("asset_id") % 2 === 1)
    val batchTbl = "graft_test_cid_land_batch"
    val streamTbl = "graft_test_cid_land_stream"
    drop(batchTbl, s"${batchTbl}_meta", streamTbl, s"${streamTbl}_meta")
    Multimodal.writeFrameIndex(a, batchTbl, buckets = 8)
    Multimodal.appendToFrameIndex(b, batchTbl)
    Multimodal.writeFrameIndex(a, streamTbl, buckets = 8)
    val rows = b.collect().toSeq.sortBy(_.asset_id)
    val parts = (0 until 3).map(r => rows.filter(_.asset_id % 3 == r))
    val input = MemoryStream[Multimodal.MediaAsset]
    val q = StreamLanding.intoFrameIndex(spark, input.toDF(), streamTbl)()
      .queryName("stream_cid_landing_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
    def rowSet(t: String) =
      spark.table(t).collect().map(_.mkString("|")).toSet
    assert(rowSet(streamTbl) == rowSet(batchTbl))
    assert(spark.table(streamTbl).count() == rowSet(streamTbl).size)
    drop(batchTbl, s"${batchTbl}_meta", streamTbl, s"${streamTbl}_meta")
  }
}
