package graft.log

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.QueryOptions

class LogStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val store = {
    val dir = java.nio.file.Files.createTempDirectory("graft-logstore").toString
    LogStore.materialize(spark, TestSpark.Sf, dir, Seq("events"))
    dir
  }

  private val opts = QueryOptions(bootstrapServers = "x", topics = Seq("events"),
    partitions = Some(Seq(3, 5)))

  test("archived topic answers identically to the live synthesis") {
    val live = LogQuery.canonical(LogQuery.results(spark, TestSpark.Sf, opts))
      .collect().map(_.mkString("|")).toSeq
    val archived = LogQuery.canonical(LogQuery.resultsFrom(
        LogQuery.consumedFrom(LogStore.topic(spark, store, "events"), opts), opts))
      .collect().map(_.mkString("|")).toSeq
    assert(archived == live)
    assert(live.nonEmpty)
  }

  test("spark.graft.recordSource=archive redirects RecordLog.topic to the store") {
    val live = LogQuery.canonical(LogQuery.results(spark, TestSpark.Sf, opts))
      .collect().map(_.mkString("|")).toSeq
    spark.conf.set("spark.graft.recordSource", "archive")
    spark.conf.set("spark.graft.archiveDir", store)
    try {
      val viaConf = LogQuery.canonical(LogQuery.results(spark, TestSpark.Sf, opts))
        .collect().map(_.mkString("|")).toSeq
      assert(viaConf == live)
      // And it really is the archive scan: directory-level pruning applies.
      val plan = LogQuery.results(spark, TestSpark.Sf, opts)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan)
    } finally {
      spark.conf.unset("spark.graft.recordSource")
      spark.conf.unset("spark.graft.archiveDir")
    }
  }

  test("partition predicates prune DIRECTORIES on the archive scan") {
    val df = LogQuery.consumedFrom(LogStore.topic(spark, store, "events"), opts)
    val plan = df.queryExecution.executedPlan.toString
    // The filter reached the file index, not a post-scan Filter only.
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*partition[^\\]]*\\].*"), plan)
  }
}
