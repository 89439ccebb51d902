package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.TextStats

/** Native lang_scores against the 8-regexp formulation it replaced —
  * exact per-language equality on fixture docs and on the adversarial
  * shapes where the regex semantics bite (overlap, boundaries, digits,
  * underscores, multibyte). */
class LangScoresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    GraftFunctions.register(spark)
    val n = TextStats.StopwordProfiles.size
    val cols = col("text") +: GraftFunctions.langScores(col("text")).as("ns") +:
      TextStats.hofLangScores(col("text")).zipWithIndex.map { case (c, i) => c.as(s"h$i") }
    val rows = df.select(cols: _*).collect()
    rows.foreach { r =>
      val native = r.getSeq[Int](1)
      val hof = (0 until n).map(i => r.getInt(2 + i))
      assert(native == hof, s"text=${r.getString(0)}")
    }
    assert(rows.nonEmpty)
  }

  test("native ≡ regexp on fixture documents") {
    check(graft.core.Tables.load(spark, TestSpark.Sf, "documents").limit(300))
  }

  test("native ≡ regexp on adversarial shapes") {
    check(Seq(
      "",
      "the quick brown fox and the lazy dog in the garden",
      "theand thethe und_der the-und the,der 123the the123", // boundaries, _ and digits are word chars
      "quent cionado lositos entente ingiongion",            // overlapping trigram bait
      "la ciónción ción est une décision précieuse",         // multibyte trigram (ción) + accents
      "DER Hund UND die KATZE das IST nicht EIN",            // case folding
      "le les lesles enteur eureur aux aux aux",             // fr: ent/eur share 'e'
      "a.b,c;d:e the.and.of.to.in.is",                       // stopwords split by punctuation
      ("the ing and ion tio " * 50).trim                     // long uniform repetition
    ).toDF("text"))
  }

  test("NULL text propagates NULL scores (langId falls back to und downstream)") {
    GraftFunctions.register(spark)
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(GraftFunctions.langScores(col("text")).as("ns"),
        TextStats.langId(col("text")).as("lang"))
      .head()
    assert(r.isNullAt(0))
    assert(r.getString(1) == "und")
  }
}
