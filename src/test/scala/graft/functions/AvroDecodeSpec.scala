package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.QueryOptions
import graft.log.LogQuery

/** Avro round-trip through the deserializer seam: encode with the real
  * Avro library into the Confluent wire format, decode through the
  * `avro_decode` expression / LogQuery pipeline, regex-match the rendering
  * — the shape of the reference's msgpack scenarios 7–8
  * (`/root/reference/run-integration-tests:161-176`) applied to its third
  * deserializer (`kafka.clj:38`). */
class AvroDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val eventSchema =
    """{"type": "record", "name": "Event", "fields": [
      |  {"name": "user_id", "type": "long"},
      |  {"name": "event_type", "type": "string"}]}""".stripMargin

  private val stringSchema = """{"type": "string"}"""

  private def wire(id: Int, json: String)(mk: AvroDeserializer.WireEncoder => Any): Array[Byte] = {
    val enc = new AvroDeserializer.WireEncoder(json, id)
    enc.encode(mk(enc))
  }

  test("record datum renders as the GenericData JSON form") {
    val r = new AvroRenderer(Map(7 -> eventSchema))
    val bytes = wire(7, eventSchema)(_.record("user_id" -> 42L, "event_type" -> "click"))
    assert(r.render(bytes) == """{"user_id": 42, "event_type": "click"}""")
  }

  test("bare string datum renders unquoted, like str() on a decoded String") {
    val r = new AvroRenderer(Map(1 -> stringSchema))
    assert(r.render(wire(1, stringSchema)(_ => "plain")) == "plain")
  }

  test("unknown schema id fails with a registry-miss message") {
    val r = new AvroRenderer(Map(7 -> eventSchema))
    val e = intercept[IllegalArgumentException](
      r.render(wire(99, eventSchema)(_.record("user_id" -> 1L, "event_type" -> "x"))))
    assert(e.getMessage.contains("schema id 99"))
  }

  test("file-based registry stand-in loads <id>.avsc files") {
    val dir = Files.createTempDirectory("graft-avro-registry")
    Files.write(dir.resolve("7.avsc"), eventSchema.getBytes("UTF-8"))
    Files.write(dir.resolve("12.avsc"), stringSchema.getBytes("UTF-8"))
    val reg = AvroDeserializer.loadRegistry(s"file:$dir")
    assert(reg.keySet == Set(7, 12))
    assert(reg(7) == eventSchema)
    intercept[IllegalArgumentException] {
      Files.write(dir.resolve("bogus.avsc"), "{}".getBytes("UTF-8"))
      AvroDeserializer.loadRegistry(dir.toString)
    }
  }

  private val recSchema = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", LongType),
    StructField("key", BinaryType),
    StructField("value", BinaryType)))

  private def avroTopic = {
    val rows = Seq(
      (0L, 7L, "click"), (1L, 7L, "view"), (2L, 9L, "purchase")
    ).map { case (off, uid, et) =>
      Row("topic-avro", 0, off, 1000L + off,
        s"k$uid".getBytes("UTF-8"),
        wire(7, eventSchema)(_.record("user_id" -> uid, "event_type" -> et)))
    }
    spark.createDataFrame(java.util.List.of(rows: _*), recSchema)
  }

  test("LogQuery pipeline: avro value deserializer + regex over the rendering") {
    val dir = Files.createTempDirectory("graft-avro-registry-pipe")
    Files.write(dir.resolve("7.avsc"), eventSchema.getBytes("UTF-8"))
    val opts = QueryOptions.fromMap(Map(
      "bootstrap-servers" -> "sandbox:9092", "topics" -> "topic-avro",
      "value-deserializer" -> QueryOptions.AvroDeser,
      "schema-registry-url" -> s"file:$dir",
      // regex runs on the decoded JSON rendering, like the reference's
      // post-deserialize string match (`search.clj:74-81`)
      "val-regex" -> """\{"user_id": 7, .*"""))
    val rows = LogQuery.canonical(
      LogQuery.resultsFrom(LogQuery.consumedFrom(avroTopic, opts), opts)).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("value")).toSeq == Seq(
      """{"user_id": 7, "event_type": "click"}""",
      """{"user_id": 7, "event_type": "view"}"""))
    // key went through the plain binary→string cast branch
    assert(rows.map(_.getAs[String]("key")).toSeq == Seq("k7", "k7"))
  }

  test("avro without --schema-registry-url fails the 400-contract way") {
    val opts = QueryOptions.fromMap(Map(
      "bootstrap-servers" -> "sandbox:9092", "topics" -> "topic-avro",
      "value-deserializer" -> QueryOptions.AvroDeser))
    val e = intercept[IllegalArgumentException](
      LogQuery.consumedFrom(avroTopic, opts).collect())
    assert(e.getMessage.contains("schema-registry-url"))
  }

  test("expression survives codegen over a real scan (no interpreted fallback)") {
    GraftFunctions.registerAvro(spark, Map(7 -> eventSchema))
    val out = avroTopic.select(GraftFunctions.avroDecode(col("value")).as("v"))
      .orderBy("v").collect().map(_.getString(0))
    assert(out.toSeq == Seq(
      """{"user_id": 7, "event_type": "click"}""",
      """{"user_id": 7, "event_type": "view"}""",
      """{"user_id": 9, "event_type": "purchase"}"""))
  }
}
