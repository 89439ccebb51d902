package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Signature-comparison primitives for the MinHash/LSH pair join.
  *
  * Both exist for a CODE-SIZE reason, not just speed: the pair join's
  * condition originally inlined the slot comparisons directly — a
  * 16-term agreement sum for `est_sim` plus an every-earlier-band-
  * disagrees CASE. Expressed as raw Catalyst comparisons, that put
  * ~2 KB of expression tree into the join condition; the whole-stage-
  * generated consume method for the band join crossed the JVM's huge-
  * method JIT limit and the hot matched-row loop ran INTERPRETED —
  * measured ~25× slower at the 64×-corpus probe (SCALING.md), while
  * looking merely ~2× slower at bench scale. Each expression compiles
  * to a single static call, keeping the join's generated method small
  * enough to JIT no matter what else rides in the condition.
  */
private[graft] trait SigPairExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = false) &&
        right.dataType == ArrayType(LongType, containsNull = false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint not null>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = IntegerType
}

/** `sig_agree_count(a, b) → int`: number of positions where the two
  * MinHash signatures agree — the est_sim numerator. Equivalent to
  * `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))` without the
  * two intermediate array allocations per pair. */
case class SigAgreeCountExpr(left: Expression, right: Expression)
    extends SigPairExpression {
  override def prettyName: String = "sig_agree_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigCompare.agreeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigCompare.agreeCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `sig_band_mask(a, b) → int`: bitmask with bit p set iff LSH band p
  * (signature slots `[p*RowsPerBand, (p+1)*RowsPerBand)`) agrees on every
  * slot. The first-agreeing-band emission rule becomes one mask test:
  * a pair joined in band b is emitted iff `mask & ((1 << b) - 1) = 0`
  * (no earlier band agrees — band b itself agrees by bucket equality). */
case class SigBandMaskExpr(left: Expression, right: Expression)
    extends SigPairExpression {
  override def prettyName: String = "sig_band_mask"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigCompare.bandMask(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigCompare.bandMask($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigCompare {
  /** LSH banding layout over the [[MinHashSigExpr.NumHashes]]-slot
    * signature (the DuckDB oracle renders the same constants). */
  val Bands = 4
  val RowsPerBand: Int = MinHashSigExpr.NumHashes / Bands

  def agreeCount(a: ArrayData, b: ArrayData): Int = {
    var c = 0
    var j = 0
    val n = MinHashSigExpr.NumHashes
    while (j < n) {
      if (a.getLong(j) == b.getLong(j)) c += 1
      j += 1
    }
    c
  }

  def bandMask(a: ArrayData, b: ArrayData): Int = {
    var mask = 0
    var p = 0
    while (p < Bands) {
      var agree = true
      var j = p * RowsPerBand
      val end = j + RowsPerBand
      while (agree && j < end) {
        agree = a.getLong(j) == b.getLong(j)
        j += 1
      }
      if (agree) mask |= 1 << p
      p += 1
    }
    mask
  }
}
