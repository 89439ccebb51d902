package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's third deserializer: Confluent-registry Avro
  * (`/root/reference/src/kbrowse/kafka.clj:38`, wired behind
  * `schema.registry.url` at `search.clj:132-135`). The registry protocol
  * needs a network service the sandbox doesn't have, so the registry is a
  * *stand-in*: a directory of `<schema-id>.avsc` files (the exact payload
  * a real registry's `GET /schemas/ids/<id>` returns). Everything after
  * the lookup is the real thing — Confluent wire-envelope parse
  * ([[ConfluentWire]]), `GenericDatumReader` binary decode against the
  * writer schema, and the `GenericData` JSON rendering that
  * `str(GenericData$Record)` produces in the reference, which its
  * try-parse-JSON step (`search.clj:44-54`) then re-parses into structure.
  *
  * Scale note: schemas are a tiny id→JSON map captured in the expression
  * and shipped once per task via the codegen reference array — decode
  * itself is per-row, executor-side, no driver round-trips and no shuffle.
  */
object AvroDeserializer {

  /** Load the file-based registry stand-in: every `<id>.avsc` in the
    * directory (local path or `file:` URL) becomes one registered schema.
    */
  def loadRegistry(url: String): Map[Int, String] = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(
      url.stripPrefix("file://").stripPrefix("file:"))
    require(java.nio.file.Files.isDirectory(path),
      s"schema registry stand-in is not a directory: $url")
    java.nio.file.Files.list(path).iterator().asScala
      .filter(_.toString.endsWith(".avsc"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".avsc")
        val id = try name.toInt catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"registry file name must be <schema-id>.avsc, got ${p.getFileName}")
        }
        id -> new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
      }.toMap
  }

  /** Encode a datum into the Confluent wire format (test/KAT producer
    * side — the inverse of [[AvroRenderer.render]]). One instance per
    * partition; not thread-safe. */
  final class WireEncoder(schemaJson: String, schemaId: Int) {
    private val schema = new Schema.Parser().parse(schemaJson)
    private val writer = new GenericDatumWriter[Any](schema)

    def record(fields: (String, Any)*): GenericRecord = {
      val r = new GenericData.Record(schema)
      fields.foreach { case (k, v) => r.put(k, v) }
      r
    }

    def encode(datum: Any): Array[Byte] = {
      val payload = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(payload, null)
      writer.write(datum, enc)
      enc.flush()
      val body = payload.toByteArray
      val out = new Array[Byte](5 + body.length)
      out(0) = 0x0
      out(1) = ((schemaId >>> 24) & 0xff).toByte
      out(2) = ((schemaId >>> 16) & 0xff).toByte
      out(3) = ((schemaId >>> 8) & 0xff).toByte
      out(4) = (schemaId & 0xff).toByte
      System.arraycopy(body, 0, out, 5, body.length)
      out
    }
  }
}

/** Executor-side decode+render: schema JSON travels as strings (Avro
  * `Schema` is not serializable), readers parse lazily once per JVM. */
final class AvroRenderer(schemasJson: Map[Int, String]) extends Serializable {

  @transient private lazy val readers: Map[Int, GenericDatumReader[Any]] =
    schemasJson.map { case (id, js) =>
      id -> new GenericDatumReader[Any](new Schema.Parser().parse(js))
    }

  def render(bytes: Array[Byte]): String = {
    val env = ConfluentWire.parse(bytes)
    val reader = readers.getOrElse(env.schemaId,
      throw new IllegalArgumentException(
        s"schema id ${env.schemaId} not found in registry (have ${schemasJson.keys.toSeq.sorted.mkString(", ")})"))
    val datum = reader.read(null, DecoderFactory.get().binaryDecoder(env.payload, null))
    datum match {
      // A bare string datum renders unquoted, like Clojure `str` on the
      // String a KafkaAvroDeserializer returns for a string schema.
      case s: CharSequence => s.toString
      // Records/maps/arrays/etc render via GenericData's JSON form — what
      // `str(GenericData$Record)` yields in the reference.
      case other => GenericData.get().toString(other)
    }
  }
}

/** `avro_decode(binary) → string`: wire-envelope parse + registry-schema
  * binary decode + JSON rendering, codegen'd. */
case class AvroDecodeExpr(child: Expression, schemasJson: Map[Int, String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "avro_decode"

  @transient private lazy val renderer = new AvroRenderer(schemasJson)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(renderer.render(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroRenderer", new AvroRenderer(schemasJson),
      classOf[AvroRenderer].getName)
    defineCodeGen(ctx, ev, c => s"UTF8String.fromString($ref.render($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
