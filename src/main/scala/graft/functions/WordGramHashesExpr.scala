package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_gram_hashes(text, n) → array<bigint>`: the 63-bit polynomial
  * fingerprint `h = (h*31 + byte) mod 2^63` of every word n-gram of the
  * lowercased whitespace tokens — hashing the EXACT byte sequence of the
  * space-joined gram string [[WordGramsExpr]] would build, without ever
  * materializing it.
  *
  * This is the fingerprint-probe path for decontamination at corpus
  * scale (the design Bloom-filter decontam pipelines use): the
  * train-side explode emits one LONG per gram instead of a ~50-byte
  * string, so the probe of the broadcast eval set allocates nothing and
  * the join keys are fixed-width. At 2^63, a false hit needs a corpus
  * gram colliding with an eval gram: expected cross-collisions for a
  * 10^8-gram corpus against a 10^5-gram eval set are ~10^-6 — and the
  * DuckDB oracle walks the SAME bytes through the same fold
  * ([[graft.oracle.Duck.gramHash63Sql]]), so the gate checks the shipped
  * fingerprint semantics, not an idealized string compare.
  *
  * Tokenization and lowering are byte-for-byte [[WordGramsExpr]]'s
  * (WordGramsSpec pins hash(native gram strings) ≡ this expression).
  */
case class WordGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"window size must be positive: $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramHashesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramHashesExpr {
  private val Empty = UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
  private val Mask63 = Long.MaxValue // 2^63 - 1; & equals mod 2^63

  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r') // Java regex \s (ASCII)

  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    var starts = new Array[Int](32)
    var ends = new Array[Int](32)
    var count = 0
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = st
        ends(count) = i
        count += 1
      } else i += 1
    }
    val m = count - n + 1
    if (m <= 0) return Empty
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      // Fold the joined gram's bytes: token bytes with one ' ' between
      // tokens — the exact byte sequence of the gram string.
      var h = 0L
      var j = k
      val last = k + n - 1
      while (j <= last) {
        if (j > k) h = ((h * 31) + ' '.toByte) & Mask63
        var p = starts(j)
        val e = ends(j)
        while (p < e) {
          h = ((h * 31) + (bytes(p) & 0xff)) & Mask63
          p += 1
        }
        j += 1
      }
      out(k) = h
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
