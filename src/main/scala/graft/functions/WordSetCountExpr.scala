package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_set_count(text, 'w1,w2,...')` → int: how many maximal word runs
  * of the LOWERED text equal one of the comma-separated set words — the
  * native form of `regexp_count(lower(text), '\b(w1|...|wn)\b')`, one
  * byte walk instead of a full regex pass (equivalence pinned by
  * WordGramsSpec on fixture + adversarial text).
  *
  * The word set must be a foldable string literal: the packed lookup
  * table ([[PackedWordTable]]) is built once per expression instance and
  * shipped to the generated code as a reference object.
  */
case class WordSetCountExpr(child: Expression, wordsCsv: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_set_count"

  @transient private lazy val table =
    new PackedWordTable(wordsCsv.split(',').toSeq.map(w => (w.trim, 1)))

  override protected def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wordTable", table,
      classOf[PackedWordTable].getName)
    defineCodeGen(ctx, ev, c => s"$tableRef.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordSetCountExpr {
  /** Registry helper: the second argument must be a foldable STRING
    * literal naming the word set. */
  def fromExprs(exprs: Seq[Expression]): WordSetCountExpr = exprs(1) match {
    case Literal(s: UTF8String, StringType) => WordSetCountExpr(exprs(0), s.toString)
    case other => throw new IllegalArgumentException(
      s"word_set_count requires a string literal word set, got $other")
  }
}
