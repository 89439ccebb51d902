package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_set(text) → array<bigint>`: the DISTINCT `ShingleK`-gram
  * rolling-hash set of a document in one native pass — the exact-verify
  * companion of [[MinHashSigExpr]] (same window walk, collecting the
  * distinct hashes in first-occurrence order instead of permutation
  * minima).
  *
  * Replaces `array_distinct(transform(sequence(...), i -> rolling_hash(
  * substring(text, i, K))))`, which allocates a K-char UTF8String per
  * window and an O(n²)-ish distinct pass. Numerically identical output
  * (order included: first occurrence, as `array_distinct` keeps).
  *
  * PRECONDITION (inherited from [[MinHashSigExpr]], pinned by the same
  * equivalence test): windows are BYTE windows; the HOF form and the
  * DuckDB oracle window over CHARACTERS. Identical on ASCII text — which
  * the documents fixture is — route non-ASCII corpora through the HOF
  * form or normalize first.
  */
case class ShingleSetExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSetExpr.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleSetExpr.compute($c.getBytes());
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSetExpr {
  import MinHashSigExpr.ShingleK
  private final val Mask = 0xFFFFFFFFL
  private final val TopPow: Long = {
    var p = 1L
    for (_ <- 1 until ShingleK) p = (p * 31) & Mask
    p
  }

  /** Returns null for texts shorter than one shingle (mirrors the
    * `length >= ShingleK` gate of the array formulation). */
  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n < ShingleK) return null
    val seen = new java.util.HashSet[java.lang.Long](1 << 11)
    val out = new scala.collection.mutable.ArrayBuffer[Any](n - ShingleK + 1)
    var h = 0L
    var i = 0
    while (i < ShingleK) { h = (h * 31 + (bytes(i) & 0xff)) & Mask; i += 1 }
    var start = 0
    while (true) {
      if (seen.add(h)) out += h
      if (start + ShingleK >= n) {
        return new GenericArrayData(out.toArray)
      }
      h = ((h - ((bytes(start) & 0xffL) * TopPow) & Mask) * 31 + (bytes(start + ShingleK) & 0xff)) & Mask
      start += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
