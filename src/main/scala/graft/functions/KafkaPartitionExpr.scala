package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Murmur2

/** `kafka_partition(key, n)` — murmur2(utf8(key)) & 0x7fffffff % n, the
  * placement Kafka's DefaultPartitioner computes and the reference asks it
  * for (`/root/reference/src/kbrowse/kafka.clj:59-70`). A native Catalyst
  * expression (not a Scala UDF) so it participates in whole-stage codegen:
  * the generated code calls the static hasher directly on the UTF8String
  * bytes with no Row boxing or String conversion.
  */
case class KafkaPartitionExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
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
