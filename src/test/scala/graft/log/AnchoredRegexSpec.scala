package graft.log

import scala.util.Random

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property: `anchored(rlike)` ≡ `java.util.regex.Matcher.matches` —
  * the re-matches parity requirement (SURVEY.md §7.4 risk 1). */
class AnchoredRegexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(1234)
  private val alphabet = "abk012.*"

  private def randomString(): String =
    Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(6))).mkString // no metachars

  private def randomPattern(): String =
    Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.length))).mkString

  test("anchored rlike agrees with java re-matches on 30 patterns × 60 strings") {
    val strings = Seq.fill(60)(randomString()).distinct
    val df = strings.toDF("s").cache()
    for (_ <- 1 to 30) {
      val pat = randomPattern()
      val compiled =
        try Some(java.util.regex.Pattern.compile(pat))
        catch { case _: Exception => None }
      compiled.foreach { p =>
        val sparkMatches = df.filter(col("s").rlike(LogQuery.anchored(pat)))
          .collect().map(_.getString(0)).toSet
        val javaMatches = strings.filter(s => p.matcher(s).matches()).toSet
        assert(sparkMatches == javaMatches, s"pattern=$pat")
      }
    }
    df.unpersist()
  }

  test("find-semantics regex would differ: anchored 'k' on 'k0'") {
    val df = Seq("k0").toDF("s")
    assert(df.filter(col("s").rlike("k")).count() == 1) // raw rlike: find
    assert(df.filter(col("s").rlike(LogQuery.anchored("k"))).count() == 0) // anchored: full
  }
}
