package graft.functions

import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native word_grams/token_chunks expressions against the HOF
  * formulations they replaced — exact equality, per doc, on fixture text
  * AND adversarial cases (multibyte, tabs/newlines, short, empty). */
class WordGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    GraftFunctions.register(spark)
    val both = df.select(
      col("text"),
      GraftFunctions.wordGrams(col("text"), 4).as("ng"),
      graft.pipeline.Decontam.hofWordGrams(col("text"), 4).as("hg"),
      GraftFunctions.tokenChunks(col("text"), 8).as("nc"),
      graft.pipeline.Passages.hofChunkArray(col("text"), 8).as("hc"),
      GraftFunctions.tokenStats(col("text")).as("ts"),
      graft.pipeline.TextStats.hofTokenCount(col("text")).cast("long").as("tc"),
      org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.regexp_extract_all(
          col("text"), org.apache.spark.sql.functions.lit("\\S+"),
          org.apache.spark.sql.functions.lit(0)),
        org.apache.spark.sql.functions.lit(0L),
        (acc, x) => acc + org.apache.spark.sql.functions.length(x)).as("tl"),
      graft.pipeline.TextStats.hofPunctCount(col("text")).cast("long").as("pc"),
      GraftFunctions.wordSetCount(col("text"), "the,and,of,to,in,is").as("wsc"),
      org.apache.spark.sql.functions.regexp_count(
        org.apache.spark.sql.functions.lower(col("text")),
        org.apache.spark.sql.functions.lit("\\b(the|and|of|to|in|is)\\b")).as("wsr"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"grams: ${r.getString(0)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"chunks: ${r.getString(0)}")
      assert(r.getSeq[Long](5) == Seq(r.getLong(6), r.getLong(7), r.getLong(8)),
        s"token stats: ${r.getString(0)}")
      assert(r.getInt(9) == r.getInt(10), s"word set count: ${r.getString(0)}")
    }
    assert(both.nonEmpty)
  }

  test("native ≡ HOF on fixture documents") {
    check(graft.core.Tables.load(spark, TestSpark.Sf, "documents").limit(200))
  }

  test("native ≡ HOF on adversarial text shapes") {
    check(Seq(
      "",                                          // no tokens
      " \t \n ",                                   // whitespace only
      "one two three",                             // fewer than n tokens
      "a\tb\ncd\fe\rf g h i",                // every \s separator
      "  doubled   spaces   between   tokens  x",  // non-single separators
      "Émile über 中文 ☃𝄞 mixé CASE Folding TEXT words here", // multibyte + case
      "Wait... really?! Yes; no: maybe, ok.",      // dense punctuation
      ".,!?;: ... ::;;!!",                         // punctuation-only tokens
      ("tok " * 100).trim                          // long uniform run
    ).toDF("text"))
  }

  test("word_gram_hashes ≡ 63-bit fold of the word_grams strings") {
    GraftFunctions.register(spark)
    def fold63(g: String): Long =
      g.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) & Long.MaxValue)
    val rows = graft.core.Tables.load(spark, TestSpark.Sf, "documents").limit(100)
      .select(col("text")).union(Seq(
        "", " \t ", "one two three",
        "Émile über 中文 ☃𝄞 mixé CASE Folding TEXT words here").toDF("text"))
      .select(
        GraftFunctions.wordGrams(col("text"), 4).as("g"),
        GraftFunctions.wordGramHashes(col("text"), 4).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).map(fold63) == r.getSeq[Long](1))
    }
    assert(rows.exists(_.getSeq[String](0).nonEmpty))
  }

  test("chunked mode keeps the short tail; gram mode drops partial windows") {
    GraftFunctions.register(spark)
    val r = Seq("a b c d e f g h i j").toDF("text").select(
      GraftFunctions.tokenChunks(col("text"), 4).as("c"),
      GraftFunctions.wordGrams(col("text"), 4).as("g")).head()
    assert(r.getSeq[String](0) == Seq("a b c d", "e f g h", "i j"))
    assert(r.getSeq[String](1).size == 7) // 10 - 4 + 1 full windows
    assert(r.getSeq[String](1).head == "a b c d")
  }

  test("the expressions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val p = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(expr("word_grams(text, 2)")).queryExecution.executedPlan.toString
    // `*(1) Project` is the codegen marker in the compact plan string — a
    // non-codegen expression would print a bare `Project`.
    assert(p.contains("*(1) Project [word_grams"), p)
  }
}
