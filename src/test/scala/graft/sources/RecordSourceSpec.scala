package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RecordSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ParquetLogSource produces the canonical record schema") {
    val df = new ParquetLogSource(TestSpark.Sf).records(spark, Seq("events"))
    assert(df.schema.fieldNames.toSeq ==
      Seq("topic", "partition", "offset", "timestamp", "key", "value"))
    assert(df.count() > 0)
  }

  test("KafkaRecordSource fails fast without the connector") {
    intercept[UnsupportedOperationException](
      new KafkaRecordSource("b:9092").records(spark, Seq("t")))
  }
}
