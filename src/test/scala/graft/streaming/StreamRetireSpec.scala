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

  test("streamed postings landing then delete stream ≡ write-on-remaining BM25 (r19)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val t = "graft_sretire_postings"
    val tRef = "graft_sretire_postings_ref"
    def dropAll(x: String): Unit =
      Seq(x, s"${x}_lens", s"${x}_stats", s"${x}_meta").foreach { y =>
        spark.sql(s"DROP TABLE IF EXISTS $y")
        spark.sql(s"DROP TABLE IF EXISTS ${y}_srcs")
      }
    dropAll(t); dropAll(tRef)
    val keep = docs.filter(col("doc_id") % 3 =!= 0)
    val doomed = docs.filter(col("doc_id") % 3 === 0)
    graft.pipeline.Bm25.writePostingsIndex(keep, "doc_id", "text", t,
      buckets = 8)
    // Land the doomed docs as a STREAM, then delete them as a STREAM —
    // the fold must come back to the initial write exactly.
    val rows = doomed.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val parts = (0 until 3).map(r => rows.filter(_._1 % 3 == 0).filter(x => (x._1 / 3) % 3 == r))
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamLanding.intoPostingsIndex(spark,
        in1.toDF().toDF("doc_id", "text"), "doc_id", "text", t,
        srcPrefix = "spost-land")()
      .queryName("stream_postings_landing_test").start()
    try {
      parts.foreach { p => in1.addData(p); q1.processAllAvailable() }
    } finally q1.stop()
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamRetire.fromPostingsIndex(spark,
        in2.toDF().toDF("doc_id", "text"), "doc_id", "text", t,
        srcPrefix = "spost-td")()
      .queryName("stream_postings_retire_test").start()
    try {
      parts.foreach { p => in2.addData(p); q2.processAllAvailable() }
    } finally q2.stop()
    graft.pipeline.Bm25.writePostingsIndex(keep, "doc_id", "text", tRef,
      buckets = 8)
    def probe(x: String) = graft.pipeline.Bm25.topKFromIndex(spark, x,
        Seq("dup", "vector", "scan"), k = 10)
      .collect().map(_.mkString("|")).toSeq
    assert(probe(t) == probe(tRef))
    graft.pipeline.Bm25.compactPostingsIndex(spark, t)
    assert(probe(t) == probe(tRef))
    dropAll(t); dropAll(tRef)
  }

  test("streamed phrase-index landing then delete stream ≡ write-on-remaining (r20)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val t = "graft_sretire_phrase"
    val tRef = "graft_sretire_phrase_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val keep = docs.filter(col("doc_id") % 3 =!= 0)
    val doomed = docs.filter(col("doc_id") % 3 === 0)
    graft.pipeline.PhraseIndex.writePhraseIndex(keep, "doc_id", "text",
      t, buckets = 8)
    val rows = doomed.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val parts = (0 until 3).map(r => rows.filter(x => (x._1 / 3) % 3 == r))
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamLanding.intoPhraseIndex(spark,
        in1.toDF().toDF("doc_id", "text"), "doc_id", "text", t,
        srcPrefix = "sphr-land")()
      .queryName("stream_phrase_landing_test").start()
    try {
      parts.foreach { p => in1.addData(p); q1.processAllAvailable() }
    } finally q1.stop()
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamRetire.fromPhraseIndex(spark,
        in2.toDF().toDF("doc_id", "text"), "doc_id", "text", t,
        srcPrefix = "sphr-td")()
      .queryName("stream_phrase_retire_test").start()
    try {
      parts.foreach { p => in2.addData(p); q2.processAllAvailable() }
    } finally q2.stop()
    graft.pipeline.PhraseIndex.writePhraseIndex(keep, "doc_id", "text",
      tRef, buckets = 8)
    def probe(x: String) = {
      val (r, frames) = graft.ops.Materialize.collecting {
        (graft.pipeline.PhraseIndex.occurrencesFromIndex(spark, x,
            Seq("hash", "agg")).collect().map(_.mkString("|")).toSeq,
          graft.pipeline.PhraseIndex.withinWindowFromIndex(spark, x,
            "table", "scan", window = 4)
            .collect().map(_.mkString("|")).toSeq)
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(probe(t) == probe(tRef))
    graft.pipeline.PhraseIndex.compactPhraseIndex(spark, t)
    assert(probe(t) == probe(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("streamed regex-index landing then delete stream ≡ write-on-remaining (r20)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val t = "graft_sretire_regex"
    val tRef = "graft_sretire_regex_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val keep = docs.filter(col("doc_id") % 3 =!= 0)
    val doomed = docs.filter(col("doc_id") % 3 === 0)
    graft.pipeline.RegexIndex.writeRegexIndex(keep, "doc_id", "text",
      t, buckets = 8)
    val rows = doomed.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val parts = (0 until 3).map(r => rows.filter(x => (x._1 / 3) % 3 == r))
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamLanding.intoRegexIndex(spark,
        in1.toDF().toDF("doc_id", "text"), "doc_id", "text", t,
        srcPrefix = "srgx-land")()
      .queryName("stream_regex_landing_test").start()
    try {
      parts.foreach { p => in1.addData(p); q1.processAllAvailable() }
    } finally q1.stop()
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamRetire.fromRegexIndex(spark,
        in2.toDF().toDF("doc_id", "text"), "doc_id", "text", t,
        srcPrefix = "srgx-td")()
      .queryName("stream_regex_retire_test").start()
    try {
      parts.foreach { p => in2.addData(p); q2.processAllAvailable() }
    } finally q2.stop()
    graft.pipeline.RegexIndex.writeRegexIndex(keep, "doc_id", "text",
      tRef, buckets = 8)
    // Probe CANDIDATES so a stale nomination cannot hide behind rlike.
    def probe(x: String) = graft.pipeline.RegexIndex
      .candidatesFromIndex(spark, x, "slow [a-z]+ join").get
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(probe(t) == probe(tRef) && probe(t).nonEmpty)
    graft.pipeline.RegexIndex.compactRegexIndex(spark, t)
    assert(probe(t) == probe(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("retire-ordering gate: a retire naming an uncommitted landing fails BEFORE any subtract lands (r20)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val t = "graft_sretire_gate"
    drop(t, s"${t}_meta", s"${t}_srcs")
    val base = docs.filter(col("doc_id") % 2 === 0)
    val landing = docs.filter(col("doc_id") % 2 === 1)
    CorpusWriter.writeGramIndex(base, "text", n = 4, t, buckets = 8)
    val doomed = landing.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(20)
      .map { case (id, tx) => (id, tx, "wave1") } // rows name their landing
    def retire(prefix: String): Unit = {
      val in = MemoryStream[(Long, String, String)]
      val q = StreamRetire.fromGramIndex(spark,
          in.toDF().toDF("doc_id", "text", "land_src"), "text", t,
          srcPrefix = prefix, gateOnLandSrcCol = Some("land_src"))()
        .queryName(s"stream_gate_test_$prefix").start()
      try {
        in.addData(doomed); q.processAllAvailable()
      } finally q.stop()
    }
    val rowsBefore = spark.table(t).count()
    // 'wave1' has not landed: the gate fails the batch loudly...
    val e = intercept[Exception] { retire("gate-early") }
    assert(Option(e.getMessage).exists(_.contains("retire-ordering gate")) ||
      Option(e.getCause).flatMap(c => Option(c.getMessage))
        .exists(_.contains("retire-ordering gate")), s"unexpected: $e")
    // ...and nothing subtracted.
    assert(spark.table(t).count() == rowsBefore)
    // After the landing commits, the SAME retire goes through.
    CorpusWriter.appendToGramIndex(landing, "text", t, src = "wave1")
    retire("gate-late")
    val live = CorpusWriter.readGramIndex(spark, t).count()
    // The 20 retired docs' fingerprints net out of the landed wave.
    val ref = "graft_sretire_gate_ref"
    drop(ref, s"${ref}_meta")
    val doomedIds = doomed.map(_._1)
    CorpusWriter.writeGramIndex(
      base.unionAll(landing.filter(!col("doc_id").isin(doomedIds: _*))),
      "text", n = 4, ref, buckets = 8)
    assert(live == CorpusWriter.readGramIndex(spark, ref).count())
    drop(t, s"${t}_meta", s"${t}_srcs", ref, s"${ref}_meta")
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
