package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TF-IDF keyword extraction: planted-fixture semantics (rarity beats
  * raw frequency; corpus-wide terms rank last) and the determinism
  * properties the oracle hash relies on. */
class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "common common rare"),
    (1L, "common filler filler words here"),
    (2L, "common words appear everywhere here"),
    (3L, "unique singleton common")
  ).toDF("doc_id", "text")

  test("a document-unique term outranks a corpus-wide term despite lower tf") {
    val got = TfIdf.topTerms(docs, "doc_id", "text", topN = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(5))).toSeq
    // doc 0, N=4: "rare" tf=1 df=1 → 1×(5/2) = 2.5 beats "common" tf=2
    // df=4 → 2×(5/5) = 2.0 — rarity outweighs double the frequency.
    assert(got.filter(_._1 == 0L).sortBy(_._3).map(_._2) == Seq("rare", "common"))
    // doc 3's two singleton terms tie on score and break by term bytes.
    val doc3 = got.filter(_._1 == 3L).sortBy(_._3).map(_._2)
    assert(doc3 == Seq("singleton", "unique"))
  }

  test("scores are the documented two-op form and ranks are dense per doc") {
    val rows = TfIdf.topTerms(docs, "doc_id", "text", topN = 3).collect()
    val n = 4L
    rows.foreach { r =>
      val tf = r.getLong(2); val df = r.getLong(3)
      assert(r.getDouble(4) == tf.toDouble * ((n + 1).toDouble / (df + 1).toDouble))
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getLong(5)).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("result is invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TfIdf.topTerms(df, "doc_id", "text", topN = 3)
        .collect().map(_.toString).toSeq
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("fixture corpus: every doc with text yields rows, capped at topN") {
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = TfIdf.topTerms(fixture, "doc_id", "text", topN = 3)
    val perDoc = got.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 3))
    assert(perDoc.length == fixture.filter("length(text) > 0").count())
  }
}
