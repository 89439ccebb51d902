package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_set(text) → array<int>`: the DISTINCT `ShingleK`-gram
  * rolling-hash set of a document in one native pass — the exact-verify
  * companion of [[MinHashSigExpr]] (same window walk, collecting the
  * distinct hashes instead of permutation minima). Hashes are 32-bit
  * values, stored as INT (the bijective wrap of the 0..2^32-1 range —
  * halves every downstream shuffle and join payload) and SORTED, so
  * set intersections run as allocation-free merges
  * ([[SortedIntersectCountExpr]]).
  *
  * Replaces `array_distinct(transform(sequence(...), i -> rolling_hash(
  * substring(text, i, K))))`, which allocates a K-char UTF8String per
  * window and an O(n²)-ish distinct pass. Same SET of hashes (the
  * equivalence test compares set-wise through the wrap).
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

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
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
    val raw = new Array[Int](n - ShingleK + 1)
    var h = 0L
    var i = 0
    while (i < ShingleK) { h = (h * 31 + (bytes(i) & 0xff)) & Mask; i += 1 }
    var start = 0
    while (true) {
      raw(start) = h.toInt // bijective 32-bit wrap
      if (start + ShingleK >= n) {
        java.util.Arrays.sort(raw)
        // in-place dedup of the sorted run
        var w = 0
        var r = 1
        while (r < raw.length) {
          if (raw(r) != raw(w)) { w += 1; raw(w) = raw(r) }
          r += 1
        }
        return UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(raw, w + 1))
      }
      h = ((h - ((bytes(start) & 0xffL) * TopPow) & Mask) * 31 + (bytes(start + ShingleK) & 0xff)) & Mask
      start += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
