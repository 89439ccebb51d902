package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The positional-postings sidecar (q191): stored probe ≡ in-session
  * occurrences bit-for-bit, adjacency semantics (crafted docs where
  * bag-of-words would false-positive), landing identities, the
  * O(deleted) takedown, compaction invisibility, and the loud edges. */
class PhraseIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    graft.core.Tables.load(spark, TestSpark.Sf, "documents")

  private def drop(t: String): Unit =
    Seq(t, s"${t}_meta").foreach { x =>
      spark.sql(s"DROP TABLE IF EXISTS $x")
      spark.sql(s"DROP TABLE IF EXISTS ${x}_srcs")
    }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("adjacency, not co-occurrence: crafted docs separate the phrase from its bag") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "the quick brown fox jumps"),        // phrase present once
      (2L, "quick the brown fox"),              // both terms, wrong order
      (3L, "the slow brown quick fox"),         // both terms, not adjacent
      (4L, "the quick brown the quick brown"),  // phrase twice
      (5L, "THE QUICK brown"),                  // case-folded match
      (6L, "the the quick quick")               // duplicate-term traps
    ).toDF("doc_id", "text")
    val got = rows(PhraseIndex.occurrences(crafted, "doc_id", "text",
      Seq("the", "quick", "brown")))
    assert(got == Seq((1L, 1L), (4L, 2L), (5L, 1L)), got.toString)
    // Duplicate terms in the phrase resolve positionally.
    val dup = rows(PhraseIndex.occurrences(crafted, "doc_id", "text",
      Seq("the", "the", "quick")))
    assert(dup == Seq((6L, 1L)), dup.toString)
  }

  test("stored probe ≡ in-session occurrences bit-for-bit; write+append ≡ one write; replay skipped") {
    val tbl = "graft_test_phrase"
    drop(tbl)
    PhraseIndex.writePhraseIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", tbl, buckets = 8)
    PhraseIndex.appendToPhraseIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", tbl, src = "spec:odds")
    val phrase = Seq("hash", "agg")
    val stored = rows(PhraseIndex.occurrencesFromIndex(spark, tbl, phrase))
    val live = rows(PhraseIndex.occurrences(docs, "doc_id", "text", phrase))
    assert(stored.nonEmpty && stored == live)
    // Replayed landing src: skipped.
    val before = spark.table(tbl).count()
    PhraseIndex.appendToPhraseIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", tbl, src = "spec:odds")
    assert(spark.table(tbl).count() == before)
    drop(tbl)
  }

  test("proximity: window bound inclusive, self-pairs excluded, same-term form counts ordered pairs") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "alpha x x beta"),   // distance 3
      (2L, "alpha beta alpha"), // beta at 1, alphas at 0 and 2
      (3L, "beta y alpha")      // distance 2, reversed order
    ).toDF("doc_id", "text")
    val tbl = "graft_test_phrase_prox"
    drop(tbl)
    PhraseIndex.writePhraseIndex(crafted, "doc_id", "text", tbl, buckets = 4)
    def win(a: String, b: String, w: Int) =
      rows(PhraseIndex.withinWindowFromIndex(spark, tbl, a, b, w))
    assert(win("alpha", "beta", 3) == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
    assert(win("alpha", "beta", 2) == Seq((2L, 2L), (3L, 1L)))
    assert(win("alpha", "beta", 1) == Seq((2L, 2L)))
    // Order-free: the window is symmetric.
    assert(win("beta", "alpha", 2) == Seq((2L, 2L), (3L, 1L)))
    // Same-term: ordered occurrence pairs, self-pairs excluded.
    assert(win("alpha", "alpha", 2) == Seq((2L, 2L)))
    drop(tbl)
  }

  test("retire ≡ write-on-remaining; compaction answer-invisible; over-retire raises") {
    val tbl = "graft_test_phrase_ret"
    val ref = "graft_test_phrase_ret_ref"
    drop(tbl); drop(ref)
    val deleted = docs.filter(col("doc_id") % 3 === 0)
    val remaining = docs.filter(col("doc_id") % 3 =!= 0)
    PhraseIndex.writePhraseIndex(docs, "doc_id", "text", tbl, buckets = 8)
    PhraseIndex.retireFromPhraseIndex(deleted, "doc_id", "text", tbl,
      src = "spec:del")
    PhraseIndex.writePhraseIndex(remaining, "doc_id", "text", ref,
      buckets = 8)
    val phrase = Seq("hash", "agg")
    def probe(t: String) = rows(PhraseIndex.occurrencesFromIndex(spark, t, phrase))
    assert(probe(tbl) == probe(ref))
    assert(probe(tbl) ==
      rows(PhraseIndex.occurrences(remaining, "doc_id", "text", phrase)))
    // A retire reusing its batch's own landing tag still happens
    // (op-namespaced markers), and each op's replay stays skipped.
    PhraseIndex.retireFromPhraseIndex(deleted, "doc_id", "text", tbl,
      src = "spec:del")
    assert(probe(tbl) == probe(ref))
    PhraseIndex.compactPhraseIndex(spark, tbl)
    assert(probe(tbl) == probe(ref))
    // Post-compaction: one row per (term, doc_id, pos).
    val p = spark.table(tbl).select("term", "doc_id", "pos").collect()
      .map(_.toSeq)
    assert(p.length == p.distinct.length)
    // Over-retirement (docs never landed) raises at the read fold.
    val tbl2 = "graft_test_phrase_bad"
    drop(tbl2)
    PhraseIndex.writePhraseIndex(docs.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", tbl2, buckets = 8)
    PhraseIndex.retireFromPhraseIndex(docs.filter(col("doc_id") % 8 === 1),
      "doc_id", "text", tbl2, src = "spec:bad")
    val e = intercept[Exception] {
      PhraseIndex.occurrencesFromIndex(spark, tbl2, phrase).collect()
    }
    assert((e.getMessage != null && e.getMessage.contains("below zero")) ||
      e.getCause != null, s"unexpected: $e")
    drop(tbl); drop(ref); drop(tbl2)
  }
}
