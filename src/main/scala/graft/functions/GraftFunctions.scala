package graft.functions

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

  /** Per-session registration; `createOrReplaceTempFunction` is idempotent,
    * so no dedup bookkeeping (a session-keyed guard would retain sessions,
    * ADVICE r01). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "kafka_partition", exprs => KafkaPartitionExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHashExpr(exprs(0)), "built-in")
  }

  /** murmur2-based Kafka default-partitioner placement of `keyCol` among
    * `n` partitions. */
  def kafkaPartition(keyCol: String, n: Int): Column =
    expr(s"kafka_partition(CAST($keyCol AS STRING), $n)")

  /** 32-bit masked polynomial rolling hash of the string column `colExpr`
    * (document fingerprinting, SURVEY.md §2.6). */
  def rollingHash(colExpr: String): Column =
    expr(s"rolling_hash(CAST($colExpr AS STRING))")
}
