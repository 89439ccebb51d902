package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Msgpack decoder — the reference's only custom deserializer
  * (`/root/reference/src/kbrowse/msgpack.clj:22-26`, a 5-line wrapper over
  * the msgpack spec). Implements the format subset the engine needs
  * (fixint, fixstr/str8/16/32, fixmap/map16/32, fixarray/array16/32, nil,
  * bool, int/uint 8–64, float32/64) from the public msgpack spec.
  *
  * Known-answer vectors from the reference's integration harness
  * (`run-integration-tests:161-176`): bytes of "k" decode to fixint 107,
  * bytes of "v" to 118; the regex filter then runs on the STRING RENDERING
  * of the decoded value (`search.clj:74-81`), so `--key-regex 107` matches.
  */
object MsgpackDeserializer {

  /** A decoded msgpack map: ordered entries, distinguishable from an
    * array even when empty. */
  final case class MsgMap(entries: Seq[(Any, Any)])

  /** Decode one msgpack value: Long | Double | String | Boolean | null |
    * Seq[Any] | MsgMap. */
  def decode(data: Array[Byte]): Any = new Decoder(data).read()

  /** The string rendering regexes run against: scalars render bare
    * (numbers/strings/booleans, like the reference's Clojure `str`),
    * containers render as JSON. */
  def render(v: Any): String = v match {
    case null => "nil"
    case s: String => s
    case other => json(other)
  }

  /** Decode + render in one step (the form the Catalyst expression calls). */
  def renderBytes(data: Array[Byte]): String = render(decode(data))

  private def json(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case MsgMap(entries) =>
      entries.map { case (k, x) => json(k.toString) + ": " + json(x) }
        .mkString("{", ", ", "}")
    case xs: Seq[_] => xs.map(json).mkString("[", ", ", "]")
    case other => other.toString
  }

  private final class Decoder(d: Array[Byte]) {
    private var i = 0

    private def u(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 8) | (d(i) & 0xffL); i += 1; k += 1 }
      v
    }

    private def s(n: Int): Long = n match {
      case 1 => u(1).toByte.toLong
      case 2 => u(2).toShort.toLong
      case 4 => u(4).toInt.toLong
      case _ => u(8)
    }

    private def str(n: Int): String = {
      val r = new String(d, i, n, StandardCharsets.UTF_8); i += n; r
    }

    private def arr(n: Int): Seq[Any] = Seq.fill(n)(read())
    private def map(n: Int): MsgMap = MsgMap(Seq.fill(n)((read(), read())))

    def read(): Any = {
      val b = d(i) & 0xff; i += 1
      b match {
        case x if x < 0x80 => x.toLong // positive fixint
        case x if x >= 0xe0 => (x - 256).toLong // negative fixint
        case x if (x & 0xf0) == 0x80 => map(x & 0x0f)
        case x if (x & 0xf0) == 0x90 => arr(x & 0x0f)
        case x if (x & 0xe0) == 0xa0 => str(x & 0x1f)
        case 0xc0 => null
        case 0xc2 => false
        case 0xc3 => true
        case 0xca => java.lang.Float.intBitsToFloat(u(4).toInt).toDouble
        case 0xcb => java.lang.Double.longBitsToDouble(u(8))
        case 0xcc => u(1); case 0xcd => u(2); case 0xce => u(4); case 0xcf => u(8)
        case 0xd0 => s(1); case 0xd1 => s(2); case 0xd2 => s(4); case 0xd3 => s(8)
        case 0xd9 => str(u(1).toInt); case 0xda => str(u(2).toInt); case 0xdb => str(u(4).toInt)
        case 0xdc => arr(u(2).toInt); case 0xdd => arr(u(4).toInt)
        case 0xde => map(u(2).toInt); case 0xdf => map(u(4).toInt)
        case other =>
          throw new IllegalArgumentException(f"unsupported msgpack type byte 0x$other%02x")
      }
    }
  }
}

/** `msgpack_decode(binary) → string`: decode + render, codegen'd. */
case class MsgpackDecodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "msgpack_decode"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(MsgpackDeserializer.renderBytes(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.MsgpackDeserializer.renderBytes($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
