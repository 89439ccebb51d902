package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sorted_intersect_count(a, b) → int`: |a ∩ b| for two SORTED distinct
  * int arrays (the [[ShingleSetExpr]] output shape) or long arrays (the
  * sorted 63-bit gram-fingerprint sets [[graft.pipeline.Paraphrase]]
  * verifies with) via a single merge walk — no hash table, no
  * result-array allocation. `array_intersect`
  * builds a hash set and materializes the intersection per row; at the
  * 64×-probe scale the exact-Jaccard verify evaluates this once per
  * 11.6M candidate pairs, so the per-pair constant is the whole game.
  *
  * PRECONDITION: both inputs sorted ascending with no duplicates
  * (ShingleSetExpr guarantees it); unsorted input silently undercounts,
  * so route only shingle sets here.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLong: Boolean =
    left.dataType == ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(IntegerType, LongType).exists { t =>
        left.dataType == ArrayType(t, containsNull = false) &&
          right.dataType == ArrayType(t, containsNull = false)
      })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int not null> or two " +
        s"array<bigint not null>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SortedIntersectCountExpr.countLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCountExpr.count(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "countLong" else "count"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountExpr.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  /** Long-element variant (the 63-bit gram-fingerprint shape —
    * [[Paraphrase]]'s sorted distinct gram sets). Same merge walk. */
  def countLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
