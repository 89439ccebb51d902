package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical form: case, punctuation and whitespace variants collapse") {
    val rows = Seq(
      "Hello, World!",
      "hello   world",
      "HELLO-WORLD",
      "\"hello\" (world)",
      "hello world.").toDF("text")
      .select(Normalize.canonical(col("text"))).as[String].collect()
    assert(rows.toSet == Set("hello world"))
  }

  test("canonical form preserves token order and digits; multibyte strips") {
    val out = Seq("Order 66: execute!", "naïve café 中文 test")
      .toDF("text").select(Normalize.canonical(col("text")))
      .as[String].collect()
    assert(out(0) == "order 66 execute")
    // é / 中文 are non-[a-z0-9] → separators (documented overcollapse
    // direction for a dedup KEY)
    assert(out(1) == "na ve caf test")
  }

  test("dedupNormalized keeps the min id per class with collapse counts") {
    val docs = Seq(
      (5L, "The Quick Fox."), (2L, "the quick fox"), (9L, "THE—QUICK—FOX"),
      (3L, "another doc"), (7L, "!!!"), (8L, "   ")).toDF("doc_id", "text")
    val got = Normalize.dedupNormalized(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // class {2,5,9} -> keep 2 (n=3); {3} -> 3; {7,8} both canonicalize
    // to "" -> one class, keep 7 (n=2)
    assert(got == Seq((2L, 3L), (3L, 1L), (7L, 2L)))
  }

  test("report: n_norm_unique <= n_unique <= n_docs on the fixture") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val rep = Normalize.report(docs, "source", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.nonEmpty)
    rep.foreach { case (n, u, nu) => assert(nu <= u && u <= n) }
  }
}
