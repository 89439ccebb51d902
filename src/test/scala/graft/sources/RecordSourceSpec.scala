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

  test("JsonLogSource runs the same pipeline over JSONL records") {
    import graft.core.QueryOptions
    import graft.log.LogQuery
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"topic":"t","partition":0,"offset":0,"timestamp":1000,"key":"k0","value":"{\"k\": 7}"}
        |{"topic":"t","partition":0,"offset":1,"timestamp":2000,"key":"k0","value":"v1"}
        |{"topic":"u","partition":1,"offset":0,"timestamp":3000,"key":"k2","value":"v2"}
        |""".stripMargin)
    val src = new JsonLogSource(dir.toString)
    val opts = QueryOptions(bootstrapServers = "x", topics = Seq("t"), keyRegex = Some("k0"))
    val rows = LogQuery.canonical(
      LogQuery.resultsFrom(LogQuery.consumedFrom(src.records(spark, Seq("t")), opts), opts))
      .collect()
    assert(rows.map(_.getAs[String]("value")).toSeq == Seq("{\"k\": 7}", "v1"))
  }

  test("KafkaRecordSource fails fast without the connector") {
    intercept[UnsupportedOperationException](
      new KafkaRecordSource("b:9092").records(spark, Seq("t")))
  }
}
