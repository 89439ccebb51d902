package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr

/** Registration point for graft's native Catalyst expressions.
  *
  * Registration goes through the session's `FunctionRegistry` (stable API
  * across Spark 4's Column refactor) and the `Column` wrappers below are
  * built with `expr(...)`, so callers use them like any
  * `org.apache.spark.sql.functions` member.
  */
object GraftFunctions {
  private val registered = ConcurrentHashMap.newKeySet[String]()

  /** Idempotent per-session registration. Call before using the wrappers. */
  def register(spark: SparkSession): Unit = {
    if (registered.add(spark.sessionState.toString)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "kafka_partition", exprs => KafkaPartitionExpr(exprs(0), exprs(1)), "built-in")
    }
  }

  /** murmur2-based Kafka default-partitioner placement of `keyCol` among
    * `n` partitions. */
  def kafkaPartition(keyCol: String, n: Int): Column =
    expr(s"kafka_partition(CAST($keyCol AS STRING), $n)")
}
