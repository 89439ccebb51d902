package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(s)` — 32-bit-masked polynomial hash of the string's UTF-8
  * bytes: `h = (h * 31 + byte) & 0xFFFFFFFF`, returned as a non-negative
  * BIGINT. Used for document fingerprinting (SURVEY.md §2.6); the 32-bit
  * mask keeps every intermediate value reproducible in the DuckDB oracle
  * with plain BIGINT arithmetic (`graft.oracle.Duck.rollingHashSql`).
  *
  * Native Catalyst expression with `doGenCode` so it stays inside
  * whole-stage codegen on the 100 TB scan path.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashExpr.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashExpr {
  final val Mask = 0xFFFFFFFFL

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) & Mask
      i += 1
    }
    h
  }
}
