package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupExact keeps the lowest id per distinct text") {
    val docs = Seq((3L, "same", "en"), (1L, "same", "en"), (2L, "other", "de"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusWriter.dedupExact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("writeDeduped produces lang-partitioned parquet readable with pruning") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    val docs = Seq((3L, "same", "en"), (1L, "same", "en"), (2L, "other", "de"))
      .toDF("doc_id", "text", "lang")
    CorpusWriter.writeDeduped(docs, "doc_id", "text", "lang", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    // partition directory layout → partition pruning on lang
    assert(new java.io.File(dir, "lang=en").exists())
    assert(back.filter(col("lang") === "en").count() == 1)
  }
}
