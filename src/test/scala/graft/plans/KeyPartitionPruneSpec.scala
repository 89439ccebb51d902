package graft.plans

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Murmur2
import graft.log.{LogQuery, RecordLog}

/** The custom optimizer rule: literal key predicate → murmur2 partition
  * pruning, licensed by the record log's column metadata. */
class KeyPartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    if (!s.experimental.extraOptimizations.contains(KeyPartitionPruneRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ KeyPartitionPruneRule
    s
  }

  private val p13 = Murmur2.partition("13", RecordLog.NumPartitions)

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("key = literal gains the murmur2 partition conjunct") {
    val df = RecordLog.events(spark, TestSpark.Sf).filter(col("key") === "13")
    assert(optimized(df).matches(s"(?s).*partition#\\d+ = $p13.*"), optimized(df))
  }

  test("anchored literal regex (the full-match contract) triggers too") {
    val df = RecordLog.events(spark, TestSpark.Sf)
      .filter(col("key").rlike(LogQuery.anchored("13")))
    assert(optimized(df).matches(s"(?s).*partition#\\d+ = $p13.*"), optimized(df))
  }

  test("a genuinely fuzzy regex does NOT trigger pruning") {
    val df = RecordLog.events(spark, TestSpark.Sf)
      .filter(col("key").rlike(LogQuery.anchored("1.*")))
    assert(!optimized(df).matches(s"(?s).*partition#\\d+ = \\d+.*"), optimized(df))
  }

  test("the rewrite is semantics-preserving") {
    val pruned = RecordLog.events(spark, TestSpark.Sf)
      .filter(col("key") === "13").count()
    // Same predicate evaluated without the rule's help (alias the key so
    // the metadata-bearing partition attribute is out of scope).
    val plain = RecordLog.events(spark, TestSpark.Sf)
      .select(col("key").as("k2")).filter(col("k2") === "13").count()
    assert(pruned == plain && pruned > 0)
  }

  test("rule is idempotent (no duplicate conjuncts on re-optimization)") {
    val df = RecordLog.events(spark, TestSpark.Sf).filter(col("key") === "13")
    val occurrences = s"= $p13".r.findAllIn(optimized(df)).length
    assert(occurrences == 1, optimized(df))
  }
}
