package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{CorpusWriter, Winnow}

/** Streaming sidecar landing: a corpus ingested as micro-batches ends
  * with the same sidecar row set as the batch write+append chain. */
class StreamLandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fps(tbl: String, c: String): Set[Long] =
    spark.table(tbl).collect().map(_.getLong(0)).toSet

  test("streamed gram-index landing ≡ the batch write+append union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)

    val batchTbl = "graft_test_land_gram_batch"
    CorpusWriter.writeGramIndex(a, "text", n = 4, batchTbl, buckets = 8)
    CorpusWriter.appendToGramIndex(b, "text", batchTbl)

    val streamTbl = "graft_test_land_gram_stream"
    CorpusWriter.writeGramIndex(a, "text", n = 4, streamTbl, buckets = 8)
    val bRows = b.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // Deliberately UNSORTED split (thirds interleaved by modulus) —
    // arrival order must not matter.
    val parts = (0 until 3).map(r => bRows.filter(_._1 % 3 == r))
    val landed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = StreamLanding.intoGramIndex(spark,
        input.toDF().toDF("doc_id", "text"), "text", streamTbl) {
        id => landed += id
      }
      .queryName("stream_landing_fixture_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
    assert(landed.size >= 3)
    val batchSet = fps(batchTbl, "gram_fp")
    val streamSet = fps(streamTbl, "gram_fp")
    assert(streamSet == batchSet)
    // Anti-join discipline held per batch: no duplicate fingerprints.
    assert(spark.table(streamTbl).count() == streamSet.size)
  }
}
