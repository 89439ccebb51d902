package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash(text) → bigint`: the 32-bit SimHash signature in one native
  * pass — tokens are maximal non-`\s` byte runs of the ORIGINAL text (no
  * lowering, mirroring `regexp_extract_all(text, '\S+')`), each hashed
  * with the [[RollingHashExpr]] polynomial (multiplier `mult`, default
  * 31), each hash voting its bits; bit i of the signature is 1 when ≥
  * half the tokens set it (ties round up, the documented convention of
  * [[graft.pipeline.SimHash]]).
  *
  * `mult` exists for the WIDE fingerprint ([[graft.pipeline.SimHash
  * .signatures62]]): two independent polynomials (31 and 37) give two
  * independent 32-bit signatures whose 31-bit truncations concatenate
  * into a 62-bit fingerprint — the "widen the fingerprint" path of the
  * Hamming-pair cell contract.
  *
  * Replaces the HOF formulation (token-array materialization + 32
  * filter passes over it): identical numbers — the same per-token
  * hashes feed the same majority rule — pinned by the SimHashSpec
  * equivalence test and the unchanged q25 DuckDB oracle.
  */
case class SimHashExpr(child: Expression, mult: Int = 31)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String].getBytes, mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c.getBytes(), $mult)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  final val Bits = 32
  private final val Mask = 0xFFFFFFFFL

  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r') // Java regex \s (ASCII)

  def compute(bytes: Array[Byte], mult: Int): Long = {
    val counts = new Array[Int](Bits)
    var nTokens = 0
    val n = bytes.length
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        var h = 0L
        while (i < n && !isWs(bytes(i))) {
          h = (h * mult + (bytes(i) & 0xff)) & Mask
          i += 1
        }
        nTokens += 1
        var b = 0
        while (b < Bits) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      } else i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (2 * counts(b) >= nTokens) sig |= 1L << b
      b += 1
    }
    sig
  }
}
