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
    Seq(batchTbl, s"${batchTbl}_meta", s"${batchTbl}_srcs",
      "graft_test_land_gram_stream", "graft_test_land_gram_stream_meta",
      "graft_test_land_gram_stream_srcs", s"${batchTbl}_srcs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CorpusWriter.writeGramIndex(a, "text", n = 4, batchTbl, buckets = 8)
    CorpusWriter.appendToGramIndex(b, "text", batchTbl,
      src = "slandspec:odds")

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
        input.toDF().toDF("doc_id", "text"), "text", streamTbl,
        srcPrefix = "slandspec") {
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
    // Refcount discipline (r18): the stream's per-batch landings hold
    // MULTIPLE (gram_fp, c, src) rows per fingerprint; equality lives at
    // the read fold — same net doc-refcount per fp as the batch chain.
    def fold(t: String): Map[Long, Long] =
      spark.table(t).groupBy("gram_fp").agg(sum("c").as("c"))
        .collect().map(_.toSeq match {
          case Seq(fp: Long, c: Long) => fp -> c
        }).toMap
    assert(fold(streamTbl) == fold(batchTbl))
    // Compaction restores the one-row-per-fp physical layout — the raw
    // pin lives here — without moving the fold.
    CorpusWriter.compactGramIndex(spark, streamTbl)
    assert(spark.table(streamTbl).count() == streamSet.size)
    assert(fold(streamTbl) == fold(batchTbl))
  }

  private def vecParts(pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         Seq[Seq[(Long, Seq[Float])]]) = {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val bRows = b.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    (a, b, (0 until 3).map(r => bRows.filter(_._1 % 3 == r)))
  }

  private def rowSet(tbl: String): Set[String] =
    spark.table(tbl).collect().map(_.mkString("|")).toSet

  private def runLanding(input: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])],
      writer: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
      parts: Seq[Seq[(Long, Seq[Float])]]): Unit = {
    val q = writer.start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
  }

  test("streamed regex index + doc store landings serve the store-pair search ≡ batch (r20)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val idx = "graft_test_land_rgx_idx"
    val store = "graft_test_land_rgx_store"
    val refIdx = "graft_test_land_rgx_idx_ref"
    val refStore = "graft_test_land_rgx_store_ref"
    Seq(idx, store, refIdx, refStore).foreach { t =>
      Seq(t, s"${t}_meta", s"${t}_srcs")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
    graft.pipeline.RegexIndex.writeRegexIndex(a, "doc_id", "text", idx,
      buckets = 8)
    graft.pipeline.RegexIndex.writeDocStore(a, "doc_id", "text", store,
      buckets = 8)
    val bRows = b.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val parts = (0 until 3).map(r => bRows.filter(x => (x._1 / 2) % 3 == r))
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamLanding.intoRegexIndex(spark,
        in1.toDF().toDF("doc_id", "text"), "doc_id", "text", idx,
        srcPrefix = "srgxl")()
      .queryName("stream_rgx_idx_landing_test").start()
    try {
      parts.foreach { p => in1.addData(p); q1.processAllAvailable() }
    } finally q1.stop()
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamLanding.intoDocStore(spark,
        in2.toDF().toDF("doc_id", "text"), "doc_id", "text", store,
        srcPrefix = "sstorel")()
      .queryName("stream_rgx_store_landing_test").start()
    try {
      parts.foreach { p => in2.addData(p); q2.processAllAvailable() }
    } finally q2.stop()
    graft.pipeline.RegexIndex.writeRegexIndex(docs, "doc_id", "text",
      refIdx, buckets = 8)
    graft.pipeline.RegexIndex.writeDocStore(docs, "doc_id", "text",
      refStore, buckets = 8)
    val p = "slow [a-z]+ join"
    def probe(i: String, st: String) = graft.pipeline.RegexIndex
      .searchFromStore(spark, i, st, p)
      .collect().map(_.getLong(0)).toSeq
    assert(probe(idx, store) == probe(refIdx, refStore))
    assert(probe(idx, store).nonEmpty)
    Seq(idx, store, refIdx, refStore).foreach { t =>
      Seq(t, s"${t}_meta", s"${t}_srcs")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("streamed IVF-index landing ≡ the batch write+append union; probe bit-equal") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (a, b, parts) = vecParts(identity)
    val batchTbl = "graft_test_land_ivf_batch"
    Seq(batchTbl, s"${batchTbl}_cent", s"${batchTbl}_meta",
      "graft_test_land_ivf_stream", "graft_test_land_ivf_stream_cent",
      "graft_test_land_ivf_stream_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CorpusWriter.writeIvfIndex(a, "vec_id", "embedding", batchTbl,
      k = 8, rounds = 2)
    CorpusWriter.appendToIvfIndex(b, "vec_id", "embedding", batchTbl)
    val streamTbl = "graft_test_land_ivf_stream"
    CorpusWriter.writeIvfIndex(a, "vec_id", "embedding", streamTbl,
      k = 8, rounds = 2)
    val input = MemoryStream[(Long, Seq[Float])]
    runLanding(input, StreamLanding.intoIvfIndex(spark,
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      streamTbl)(), parts)
    assert(rowSet(streamTbl) == rowSet(batchTbl))
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    def probe(t: String) = graft.pipeline.Clustering.ivfTopKFromIndex(
        spark, t, emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id",
        "embedding", nprobe = 2, topK = 10)
      .collect().map(_.mkString("|")).toSeq
    assert(probe(streamTbl) == probe(batchTbl))
  }

  test("streamed SQ8-index landing ≡ the batch write+append union; probe bit-equal") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (a, b, parts) = vecParts(identity)
    val batchTbl = "graft_test_land_sq8_batch"
    Seq(batchTbl, s"${batchTbl}_grid", s"${batchTbl}_meta",
      "graft_test_land_sq8_stream", "graft_test_land_sq8_stream_grid",
      "graft_test_land_sq8_stream_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CorpusWriter.writeSq8Index(a, "vec_id", "embedding", dim = 64,
      batchTbl, buckets = 8)
    CorpusWriter.appendToSq8Index(b, "vec_id", "embedding", batchTbl)
    val streamTbl = "graft_test_land_sq8_stream"
    CorpusWriter.writeSq8Index(a, "vec_id", "embedding", dim = 64,
      streamTbl, buckets = 8)
    val input = MemoryStream[(Long, Seq[Float])]
    runLanding(input, StreamLanding.intoSq8Index(spark,
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      streamTbl)(), parts)
    assert(rowSet(streamTbl) == rowSet(batchTbl))
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    def probe(t: String) = {
      val (r, frames) = graft.ops.Materialize.collecting {
        graft.pipeline.ScalarQuant.sq8TopKFromIndex(spark, t,
            emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id",
            "embedding", dim = 64, topK = 10)
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(probe(streamTbl) == probe(batchTbl))
  }

  test("streamed RESIDUAL IVF-PQ landing ≡ the batch write+append union; probe bit-equal (r20)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (a, b, parts) = vecParts(identity)
    val batchTbl = "graft_test_land_rivfpq_batch"
    val streamTbl = "graft_test_land_rivfpq_stream"
    Seq(batchTbl, streamTbl).foreach(t =>
      Seq("", "_coarse", "_books", "_meta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    CorpusWriter.writeResidualIvfPqIndex(a, "vec_id", "embedding",
      batchTbl, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64)
    CorpusWriter.appendToResidualIvfPqIndex(b, "vec_id", "embedding",
      batchTbl)
    CorpusWriter.writeResidualIvfPqIndex(a, "vec_id", "embedding",
      streamTbl, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64)
    val input = MemoryStream[(Long, Seq[Float])]
    runLanding(input, StreamLanding.intoResidualIvfPqIndex(spark,
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      streamTbl)(), parts)
    assert(rowSet(streamTbl) == rowSet(batchTbl))
    // The served answer is bit-equal, not just the member rows.
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    def probe(t: String) = {
      val (r, frames) = graft.ops.Materialize.collecting {
        graft.pipeline.ProductQuant.residualIvfAdcTopKFromIndex(spark, t,
            emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id",
            "embedding", nprobe = 2, topK = 10)
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(probe(streamTbl) == probe(batchTbl))
  }

  test("streamed IVF-PQ-index landing ≡ the batch write+append union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (a, b, parts) = vecParts(identity)
    val batchTbl = "graft_test_land_ivfpq_batch"
    Seq(batchTbl, s"${batchTbl}_coarse", s"${batchTbl}_books",
      s"${batchTbl}_meta", "graft_test_land_ivfpq_stream",
      "graft_test_land_ivfpq_stream_coarse",
      "graft_test_land_ivfpq_stream_books",
      "graft_test_land_ivfpq_stream_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CorpusWriter.writeIvfPqIndex(a, "vec_id", "embedding", batchTbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToIvfPqIndex(b, "vec_id", "embedding", batchTbl)
    val streamTbl = "graft_test_land_ivfpq_stream"
    CorpusWriter.writeIvfPqIndex(a, "vec_id", "embedding", streamTbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val input = MemoryStream[(Long, Seq[Float])]
    runLanding(input, StreamLanding.intoIvfPqIndex(spark,
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      streamTbl)(), parts)
    assert(rowSet(streamTbl) == rowSet(batchTbl))
  }
}
