package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("report: cumulative survival, first-fail attribution, NULL = fail") {
    val flagged = Seq(
      // (source, a, b)
      ("s1", Some(true), Some(true)),   // survives both
      ("s1", Some(true), Some(false)),  // fails at b
      ("s1", Some(false), Some(true)),  // fails at a (b irrelevant)
      ("s1", None, Some(true)),         // NULL a = fail at a
      ("s2", Some(true), None)          // NULL b = fail at b
    ).toDF("source", "a", "b")
    val r = Funnel.report(flagged, "source", Seq("a", "b"))
      .collect().map(x => (x.getString(0), x.getInt(1), x.getString(2),
        x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq(
      ("s1", 1, "a", 4L, 2L),
      ("s1", 2, "b", 2L, 1L),
      ("s2", 1, "a", 1L, 1L),
      ("s2", 2, "b", 1L, 0L)))
  }

  test("curationFunnel: stage chaining is consistent on the fixture") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val rows = Funnel.curationFunnel(docs, "doc_id", "text", "source")
      .collect().map(x => (x.getString(0), x.getInt(1),
        x.getLong(3), x.getLong(4)))
    val bySource = rows.groupBy(_._1)
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.head._3 == totals(src)) // stage 1 enters everything
      ordered.foreach { case (_, _, entered, passed) =>
        assert(passed <= entered)
      }
      // passed of stage i = entered of stage i+1
      ordered.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0)._4 == w(1)._3)
      }
    }
    // The fixture actually exercises attrition somewhere.
    assert(rows.exists { case (_, _, e, p) => p < e })
  }
}
