package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Novelty scoring: planted full-copy / fully-novel / half-novel docs,
  * stored-index equivalence with the in-plan form, and the index's n
  * contract. */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted increments: copy scores 0, novel scores 1, half scores between") {
    import spark.implicits._
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, corpusText),                       // corpus
      (2L, "iota kappa lambda mu nu xi"),     // corpus
      (100L, corpusText),                     // increment: exact copy
      (101L, "foo bar baz qux quux corge"),   // increment: fully novel
      (102L, "alpha beta gamma delta foo bar baz qux")) // increment: mixed
      .toDF("doc_id", "text")
    val r = Novelty.noveltyReport(docs, "doc_id", "text",
      col("doc_id") >= 100, n = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(100L)._2 === 0L)                 // every bigram already seen
    assert(r(101L) === ((5L, 5L)))            // all 5 bigrams novel
    // doc 102: bigrams = 7; 'alpha beta','beta gamma','gamma delta' seen
    // (3); 'delta foo','foo bar','bar baz','baz qux' novel (4).
    assert(r(102L) === ((7L, 4L)))
  }

  test("stored gram index reproduces the in-plan answer bit-exactly") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val pred = col("doc_id") % 7 === 0
    val want = Novelty.noveltyReport(docs, "doc_id", "text", pred, n = 4)
      .collect().map(_.toSeq)
    val tbl = "graft_test_novelty_idx"
    CorpusWriter.writeGramIndex(docs.filter(!pred), "text", n = 4, tbl,
      buckets = 8)
    try {
      val got = Novelty.noveltyAgainstIndex(spark, tbl,
        docs.filter(pred), "doc_id", "text", n = 4)
        .collect().map(_.toSeq)
      assert(got.toSeq === want.toSeq)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_meta")
    }
  }

  test("write+append ≡ one write over the union at the refcount fold") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val pred = col("doc_id") % 7 === 0
    val corpus = docs.filter(!pred)
    val first = corpus.filter(col("doc_id") % 2 === 0)
    val second = corpus.filter(col("doc_id") % 2 === 1)
    val one = "graft_test_novelty_one"
    val two = "graft_test_novelty_two"
    CorpusWriter.writeGramIndex(corpus, "text", n = 4, one, buckets = 8)
    CorpusWriter.writeGramIndex(first, "text", n = 4, two, buckets = 8)
    CorpusWriter.appendToGramIndex(second, "text", two,
      src = "noveltyspec:second")
    // The r18 refcount layout holds MULTIPLE (gram_fp, c, src) rows per
    // fingerprint across landings — equality lives at the read fold:
    // same live fp set AND same net doc-refcount per fp as one union
    // write, whatever the physical row split.
    def fold(t: String): Map[Long, Long] =
      spark.table(t).groupBy("gram_fp").agg(sum("c").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      assert(fold(two) === fold(one))
      assert(CorpusWriter.readGramIndex(spark, two)
          .collect().map(_.getLong(0)).toSet ===
        CorpusWriter.readGramIndex(spark, one)
          .collect().map(_.getLong(0)).toSet)
      // And the scored answer is identical through either index.
      val inc = docs.filter(pred)
      val r1 = Novelty.noveltyAgainstIndex(spark, one, inc, "doc_id", "text", 4)
        .collect().map(_.toSeq)
      val r2 = Novelty.noveltyAgainstIndex(spark, two, inc, "doc_id", "text", 4)
        .collect().map(_.toSeq)
      assert(r1.toSeq === r2.toSeq)
      // Compaction restores the one-row-per-fp PHYSICAL layout — the
      // raw-row pin lives here, where the layout guarantees it again —
      // without moving the fold or the answer.
      CorpusWriter.compactGramIndex(spark, two)
      val raw = spark.table(two).collect().map(_.getLong(0))
      assert(raw.length === raw.distinct.length)
      assert(fold(two) === fold(one))
      val r3 = Novelty.noveltyAgainstIndex(spark, two, inc, "doc_id", "text", 4)
        .collect().map(_.toSeq)
      assert(r3.toSeq === r1.toSeq)
    } finally Seq(one, two).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_meta")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_srcs")
    }
  }

  test("index written under a different n fails loudly") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val tbl = "graft_test_novelty_badn"
    CorpusWriter.writeGramIndex(docs.limit(10), "text", n = 3, tbl,
      buckets = 2)
    try {
      val e = intercept[IllegalArgumentException] {
        Novelty.noveltyAgainstIndex(spark, tbl, docs.limit(5),
          "doc_id", "text", n = 4)
      }
      assert(e.getMessage.contains("n=3"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_meta")
    }
  }
}
