package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stored inverted-index sidecar (q186): probe ≡ in-session BM25
  * bit-for-bit, landing identities at the read folds, the O(deleted)
  * subtract retirement, and the loud edges. */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    graft.core.Tables.load(spark, TestSpark.Sf, "documents")
  private val Terms = Seq("dup", "vector", "scan")

  private def drop(t: String): Unit =
    Seq(t, s"${t}_lens", s"${t}_stats", s"${t}_meta").foreach { x =>
      spark.sql(s"DROP TABLE IF EXISTS $x")
      spark.sql(s"DROP TABLE IF EXISTS ${x}_srcs")
    }

  private def bits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq

  test("stored probe ≡ in-session topK bit-for-bit; write+append ≡ one write") {
    val tbl = "graft_test_postings"
    drop(tbl)
    Bm25.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", tbl, buckets = 8)
    Bm25.appendToPostingsIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", tbl, src = "spec:odds")
    val stored = bits(Bm25.topKFromIndex(spark, tbl, Terms, k = 10))
    val live = bits(Bm25.topK(docs, "doc_id", "text", Terms, k = 10))
    assert(stored == live)
    // Replayed landing src: skipped across all three tables.
    val counts = Seq(tbl, s"${tbl}_lens", s"${tbl}_stats")
      .map(t => spark.table(t).count())
    Bm25.appendToPostingsIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", tbl, src = "spec:odds")
    assert(Seq(tbl, s"${tbl}_lens", s"${tbl}_stats")
      .map(t => spark.table(t).count()) == counts)
    assert(bits(Bm25.topKFromIndex(spark, tbl, Terms, k = 10)) == live)
    drop(tbl)
  }

  test("stored MRR meter ≡ the text form; a takedown shows up as the rank dropping to 0") {
    val tbl = "graft_test_postings_mrr"
    drop(tbl)
    Bm25.writePostingsIndex(docs, "doc_id", "text", tbl, buckets = 8)
    // mod = 131: the fixture's self-retrieval succeeds for two of the
    // four queries (measured; the default 997 draws only doc 0, whose
    // common first tokens never rank it top-10 — a true meter reading,
    // but no signal for the takedown half below).
    def fromIdx() = Bm25.selfRetrievalMrrFromIndex(spark, tbl, docs,
        "doc_id", "text", mod = 131L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaText = Bm25.selfRetrievalMrr(docs, "doc_id", "text", mod = 131L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val before = fromIdx()
    assert(before == viaText)
    assert(before.exists(_._2 > 0L), "no query retrieved itself at all")
    // Retire the query docs from the index: the meter — reading stored
    // folds, not text — must now report rank 0 for every query (the
    // doc cannot be retrieved from an index it left), which is exactly
    // the staleness signal the meter exists to surface.
    val qids = before.map(_._1)
    Bm25.retireFromPostingsIndex(
      docs.filter(col("doc_id").isin(qids: _*)), "doc_id", "text", tbl,
      src = "spec:mrr-takedown")
    val after = fromIdx()
    assert(after.map(_._1) == qids)
    assert(after.forall(r => r._2 == 0L && r._3 == 0L),
      s"retired query docs still retrieved: $after")
    drop(tbl)
  }

  test("retire ≡ write-on-remaining; compaction answer-invisible; over-retire raises") {
    val tbl = "graft_test_postings_ret"
    val ref = "graft_test_postings_ret_ref"
    drop(tbl); drop(ref)
    val deleted = docs.filter(col("doc_id") % 3 === 0)
    val remaining = docs.filter(col("doc_id") % 3 =!= 0)
    Bm25.writePostingsIndex(docs, "doc_id", "text", tbl, buckets = 8)
    Bm25.retireFromPostingsIndex(deleted, "doc_id", "text", tbl,
      src = "spec:del")
    Bm25.writePostingsIndex(remaining, "doc_id", "text", ref, buckets = 8)
    def probe(t: String) = bits(Bm25.topKFromIndex(spark, t, Terms, k = 10))
    assert(probe(tbl) == probe(ref))
    // The retired docs' scores equal topK over the remaining corpus —
    // idf/avgdl recompute from the netted stats, not just membership.
    assert(probe(tbl) ==
      bits(Bm25.topK(remaining, "doc_id", "text", Terms, k = 10)))
    // Replayed retirement: skipped (a double subtract would corrupt).
    Bm25.retireFromPostingsIndex(deleted, "doc_id", "text", tbl,
      src = "spec:del")
    assert(probe(tbl) == probe(ref))
    Bm25.compactPostingsIndex(spark, tbl)
    assert(probe(tbl) == probe(ref))
    // Post-compaction physical pins: one row per key, stats one row.
    val p = spark.table(tbl).select("term", "doc_id").collect().map(_.toSeq)
    assert(p.length == p.distinct.length)
    assert(spark.table(s"${tbl}_stats").count() == 1)
    // Over-retirement (docs never landed) raises at the read fold.
    val tbl2 = "graft_test_postings_bad"
    drop(tbl2)
    Bm25.writePostingsIndex(docs.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", tbl2, buckets = 8)
    // A retire batch SMALLER than the index (so the net stats stay
    // positive and the loud failure comes from the postings fold, not
    // the no-live-docs stats guard).
    Bm25.retireFromPostingsIndex(docs.filter(col("doc_id") % 8 === 1),
      "doc_id", "text", tbl2, src = "spec:bad")
    val e = intercept[Exception] {
      Bm25.topKFromIndex(spark, tbl2, Terms, k = 10).collect()
    }
    assert((e.getMessage != null && e.getMessage.contains("below zero")) ||
      e.getCause != null, s"unexpected: $e")
    drop(tbl); drop(ref); drop(tbl2)
  }
}
