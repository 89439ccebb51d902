package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[RepeatedSpans.spans]]: planted-fixture span boundaries, the merge
  * rule, the cross-document frequency gate, and partitioning
  * invariance. */
class RepeatedSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int, minDocs: Int = 2) =
    RepeatedSpans.spans(docs.toDF("doc_id", "text"), "doc_id", "text",
        window, minDocs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq

  // A 12-token run shared verbatim by two docs; 8-token windows fully
  // inside it start at 5 offsets (12 - 8 + 1), so each doc reports ONE
  // merged span covering exactly the run.
  private val sharedRun = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"

  test("a shared run merges its overlapping windows into one exact span") {
    val got = run(Seq(
      (1L, s"a1 a2 a3 a4 $sharedRun z1 z2"),
      (2L, s"$sharedRun b1 b2 b3")), window = 8)
    // doc 1: run occupies tokens 4..15; matched window starts 4..8.
    // doc 2: run occupies tokens 0..11; matched window starts 0..4.
    assert(got == Seq((1L, 4, 15, 5L), (2L, 0, 11, 5L)))
  }

  test("runs separated by more than a window apart stay separate spans") {
    // Two shared runs of 8 tokens each; doc 3 separates them with 9
    // unique tokens (start gap 17 > window 8) -> two spans; doc 4 holds
    // them back-to-back (start gap 8 <= window) -> merged into one.
    val runA = "p1 p2 p3 p4 p5 p6 p7 p8"
    val runB = "q1 q2 q3 q4 q5 q6 q7 q8"
    val got = run(Seq(
      (3L, s"$runA u1 u2 u3 u4 u5 u6 u7 u8 u9 $runB"),
      (4L, s"$runA $runB")), window = 8)
    assert(got == Seq((3L, 0, 7, 1L), (3L, 17, 24, 1L), (4L, 0, 15, 2L)))
  }

  test("within-doc-only repetition does not flag (cross-document gate)") {
    val got = run(Seq(
      (5L, s"$sharedRun x1 x2 $sharedRun"),
      (6L, "y1 y2 y3 y4 y5 y6 y7 y8 y9")), window = 8)
    assert(got.isEmpty)
  }

  test("minDocs raises the frequency bar") {
    val docs = Seq(
      (7L, s"$sharedRun c1"),
      (8L, s"c2 $sharedRun"),
      (9L, s"c3 c4 $sharedRun"))
    assert(run(docs, window = 8, minDocs = 3).size == 3)
    assert(run(docs, window = 8, minDocs = 4).isEmpty)
  }

  test("tokenization is case-folded, matching the gram expression walk") {
    val got = run(Seq(
      (10L, "Alpha BETA gamma DELTA epsilon zeta ETA theta tail1"),
      (11L, "alpha beta GAMMA delta EPSILON zeta eta THETA tail2")),
      window = 8)
    assert(got == Seq((10L, 0, 7, 1L), (11L, 0, 7, 1L)))
  }

  test("scrub cuts exactly the spanned tokens, keeps case, normalizes whitespace") {
    val docs = Seq(
      (1L, s"A1 a2  a3\ta4 $sharedRun Z1 z2"), // case + odd whitespace
      (2L, s"$sharedRun b1 b2 b3"),
      (3L, "all unique tokens nothing repeated here at all ok")).toDF("doc_id", "text")
    val got = RepeatedSpans.scrub(docs, "doc_id", "text", window = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1: span covers tokens 4..15 (the run); survivors keep ORIGINAL
    // case and are single-space joined.
    assert(got(1L) == ("A1 a2 a3 a4 Z1 z2", 12L))
    assert(got(2L) == ("b1 b2 b3", 12L))
    // untouched doc: normalized join only, zero removed.
    assert(got(3L) == ("all unique tokens nothing repeated here at all ok", 0L))
  }

  test("scrub n_removed ≡ the union size of the doc's q69 spans, fixture-wide") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val spanCover = RepeatedSpans.spans(docs, "doc_id", "text", 8)
      .groupBy("doc_id")
      // spans are maximal and merged, so they are disjoint: the union
      // size is the plain sum of widths.
      .agg(sum(col("end_tok") - col("start_tok") + 1).as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scrubbed = RepeatedSpans.scrub(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scrubbed.nonEmpty && spanCover.nonEmpty)
    scrubbed.foreach { case (id, removed) =>
      assert(removed == spanCover.getOrElse(id, 0L), s"doc $id")
    }
    // A fully-repeated doc scrubs to the empty string (the DuckDB
    // array_to_string(empty) NULL vs Spark '' seam is oracle-handled).
    val fully = RepeatedSpans.scrub(docs, "doc_id", "text", 8)
      .filter(col("text") === "").count()
    assert(fully > 0, "the dup-dense fixture plants fully-repeated docs")
  }

  private def whole(docs: Seq[(Long, String)], window: Int,
      doublings: Int) = {
    val (r, frames) = graft.ops.Materialize.collecting {
      RepeatedSpans.wholeRepeats(docs.toDF("doc_id", "text"), "doc_id",
          "text", window, minDocs = 2, doublings = doublings)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSeq
    }
    graft.ops.Materialize.release(frames)
    r
  }

  test("wholeRepeats rejects the chimera that coverage spans merge") {
    // Doc 1's windows "a b" (shared with 2) and "c d" (shared with 3)
    // are adjacent, so q69's coverage form merges them into one 4-token
    // span — but "a b c d" as a WHOLE occurs nowhere else. The doubling
    // verification must cap doc 1 at len 2.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "p q c d"))
    val cover = run(docs, window = 2)
    assert(cover.exists { case (id, s, e, _) => id == 1L && s == 0 && e == 3 },
      s"expected the merged chimera coverage span: $cover")
    val byDoc = whole(docs, window = 2, doublings = 2)
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(byDoc(1L)._1 == 2, s"chimera must cap at the window: $byDoc")
  }

  test("wholeRepeats verifies a true whole-span repeat at its bracket") {
    // Docs 1 and 2 share the whole 8-token run verbatim: every
    // power-of-two bracket up to 8 repeats, so max_len = 8 (window 2,
    // doublings 2 → lens 2, 4, 8) with exactly one 8-long position.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 t1 t2"),
      (2L, "z9 w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "u1 u2 u3 u4"))
    val byDoc = whole(docs, window = 2, doublings = 2)
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(byDoc(1L) == ((8, 1L)), s"$byDoc")
    assert(byDoc(2L) == ((8, 1L)), s"$byDoc")
    assert(!byDoc.contains(3L))
  }

  test("wholeRepeats caps a 6-token shared run at the 4-bracket (ragged doc lengths)") {
    // r22 window-chain rewrite edge coverage: the shared run supports
    // levels 2 and 4 but not 8, and doc 2 (7 tokens) cannot even FORM a
    // level-2 fingerprint (lead past the partition end must null out
    // exactly where the old self-join dropped the row).
    val docs = Seq(
      (1L, "a b c d e f x1 x2"),
      (2L, "y a b c d e f"))
    val byDoc = whole(docs, window = 2, doublings = 2)
      .map(x => x._1 -> (x._2, x._3)).toMap
    // Shared 4-token wholes: abcd, bcde, cdef — 3 positions in each doc.
    assert(byDoc(1L) == ((4, 3L)), s"$byDoc")
    assert(byDoc(2L) == ((4, 3L)), s"$byDoc")
  }

  test("result is invariant to input partitioning") {
    val docs = (0L until 40L).map { i =>
      val tail = s"t${i}a t${i}b t${i}c t${i}d t${i}e"
      (i, if (i % 3 == 0) s"$sharedRun $tail" else s"$tail $sharedRun")
    }
    val one = RepeatedSpans.spans(docs.toDF("doc_id", "text"),
      "doc_id", "text", 8).collect().toSeq
    val many = RepeatedSpans.spans(docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text", 8).collect().toSeq
    assert(one == many && one.nonEmpty)
  }
}
