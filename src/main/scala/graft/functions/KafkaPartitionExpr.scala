package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Murmur2

/** `kafka_partition(key, n)` — murmur2(utf8(key)) & 0x7fffffff % n, the
  * placement Kafka's DefaultPartitioner computes and the reference asks it
  * for (`/root/reference/src/kbrowse/kafka.clj:59-70`). A native Catalyst
  * expression (not a Scala UDF) so it participates in whole-stage codegen:
  * the generated code calls the static hasher directly on the UTF8String
  * bytes with no Row boxing or String conversion.
  *
  * Input typing is checked explicitly (`ExpectsInputTypes`/`AbstractDataType`
  * are private[sql] in Spark 4); callers cast through
  * [[GraftFunctions.kafkaPartition]].
  */
case class KafkaPartitionExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "kafka_partition"

  override protected def nullSafeEval(key: Any, n: Any): Any =
    Murmur2.partition(key.asInstanceOf[UTF8String].getBytes, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.core.Murmur2.partition($k.getBytes(), $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
