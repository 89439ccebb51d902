package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{CorpusWriter, ScalarQuant, TrigramModel}

/** Streaming deletes: micro-batched tombstone/subtract landings serve
  * the same answers as the batch retirement, whatever the arrival
  * split. */
class StreamRetireSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drop(ts: String*): Unit =
    ts.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("streamed tombstones: probe ≡ the batch retirement from the first commit on") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val tA = "graft_sretire_sq8_a"
    val tB = "graft_sretire_sq8_b"
    drop(tA, s"${tA}_grid", s"${tA}_meta", s"${tA}_tombs",
      tB, s"${tB}_grid", s"${tB}_meta")
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64, tA,
      buckets = 8)
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64, tB,
      buckets = 8)
    CorpusWriter.retireFromSq8Index(spark, tB,
      emb.filter(col("vec_id") % 2 === 1), "vec_id")
    val odds = emb.filter(col("vec_id") % 2 === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val parts = (0 until 3).map(r => odds.filter(_ % 3 == r))
    val input = MemoryStream[Long]
    val q = StreamRetire.intoTombstones(spark,
        input.toDF().toDF("vec_id"), "vec_id", tA)()
      .queryName("stream_retire_sq8_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
    def probe(t: String): Seq[String] = {
      val (r, frames) = graft.ops.Materialize.collecting {
        ScalarQuant.sq8TopKFromIndex(spark, t,
            emb.filter(col("vec_id").isin(0L, 2L, 4L)), "vec_id",
            "embedding", dim = 64, topK = 10)
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(probe(tA) == probe(tB))
    drop(tA, s"${tA}_grid", s"${tA}_meta", s"${tA}_tombs",
      tB, s"${tB}_grid", s"${tB}_meta")
  }

  test("streamed LM subtract landings ≡ the batch retirement (scores)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val t = "graft_sretire_lm"
    val tRef = "graft_sretire_lm_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    CorpusWriter.writeLmModel(a, "text", t, buckets = 8)
    CorpusWriter.appendToLmModel(b, "text", t, src = "sretirespec:b")
    CorpusWriter.writeLmModel(a, "text", tRef, buckets = 8)
    val bRows = b.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val parts = (0 until 3).map(r => bRows.filter(_._1 % 3 == r))
    val input = MemoryStream[(Long, String)]
    val q = StreamRetire.fromLmModel(spark,
        input.toDF().toDF("doc_id", "text"), "text", t,
        srcPrefix = "sretirespec")()
      .queryName("stream_retire_lm_test")
      .start()
    try {
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
    } finally q.stop()
    def scores(tbl: String): Seq[String] = {
      val (r, frames) = graft.ops.Materialize.collecting {
        TrigramModel.scoreFromModel(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", spark.table(tbl))
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(scores(t) == scores(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }
}
