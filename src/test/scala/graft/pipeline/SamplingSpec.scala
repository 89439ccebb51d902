package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** The two-phase pruned sample must equal the naive global window form,
  * and stay invariant under input partitioning. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, n: Int): Seq[(String, Long, Long)] =
    df.select(col("lang").as("stratum"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("pick"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("stratum").orderBy("pick", "doc_id")).cast("long"))
      .filter(col("rn") <= n)
      .orderBy("stratum", "doc_id")
      .select("stratum", "doc_id", "rn").as[(String, Long, Long)].collect().toSeq

  test("pruned sample ≡ naive window on the fixture, across repartitions") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val expect = naive(docs, 7)
    assert(expect.nonEmpty)
    for (p <- Seq(1, 5, 13)) {
      val got = Sampling.stratified(docs.repartition(p), "lang", "doc_id", 7)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == expect, s"repartition=$p")
    }
  }

  test("n larger than every stratum returns all rows ranked") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val total = docs.count()
    assert(Sampling.stratified(docs, "lang", "doc_id", 1000000).count() == total)
  }
}
