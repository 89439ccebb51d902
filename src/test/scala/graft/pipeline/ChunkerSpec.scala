package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int) =
    Chunker.chunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq

  test("known doc: window starts, overlap, and short tail") {
    // 7 tokens, size 3, stride 2 -> starts 0,2,4,6; tail holds 1 token
    val got = chunksOf("a b c d e f g", 3, 2)
    assert(got == Seq(
      (0L, "a b c", 3L), (1L, "c d e", 3L), (2L, "e f g", 3L), (3L, "g", 1L)))
  }

  test("stride == size gives disjoint blocks; every token appears once") {
    val got = chunksOf("a b c d e f g", 3, 3)
    assert(got == Seq((0L, "a b c", 3L), (1L, "d e f", 3L), (2L, "g", 1L)))
    assert(got.flatMap(_._2.split(" ")) == Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("irregular whitespace normalizes inside chunks; empty docs vanish") {
    val docs = Seq((1L, "  x\t y \n z  "), (2L, ""), (3L, " \t "))
      .toDF("doc_id", "text")
    val got = Chunker.chunks(docs, "doc_id", "text", 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 0L, "x y"), (1L, 1L, "z")))
  }

  test("every token is covered; consecutive chunks overlap by size - stride") {
    val text = (1 to 53).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 8, 5)
    val starts = got.map(_._1 * 5)
    assert(starts == starts.sorted && starts.head == 0L)
    assert(starts.last < 53 && starts.last + 5 >= 53, "windows span the doc")
    got.sliding(2).foreach {
      case Seq((_, a, _), (_, b, _)) =>
        val at = a.split(" ").toSeq
        val bt = b.split(" ").toSeq
        assert(at.takeRight(3) == bt.take(math.min(3, bt.length)) ||
          bt.length < 3, s"overlap broken between [$a] and [$b]")
      case _ => ()
    }
    assert(got.last._1 * 5 + got.last._3 == 53, "last window ends at the doc end")
    assert(got.init.forall(_._3 == 8L), "all non-tail windows are full")
  }

  test("repeatedChunks finds a planted cross-doc window, full windows only") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "nothing in common here at all")).toDF("doc_id", "text")
    // size 4, stride 2: doc1 has the shared run at token offset 2, doc2
    // at 0 — both even, so the aligned windows s1..s4, s3..s6, s5..s8
    // repeat across docs.
    val got = Chunker.repeatedChunks(docs, "doc_id", "text",
        size = 4, stride = 2, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length >= 2, got.mkString(","))
    assert(got.forall(_._2 == 2L))
    // and nothing from doc 3
    val all = Chunker.repeatedChunks(docs, "doc_id", "text", 4, 2, 1)
    assert(all.filter(col("first_doc") === 3L).count() > 0)
  }
}
