package graft.core

import org.apache.spark.sql.SparkSession

import graft.log.RecordLog

/** SQL-surface registration: every fixture table plus the synthesized
  * record-log topics become temp views, so the whole engine is reachable
  * from `spark.sql(...)` — including the custom functions (registered
  * here) and the key→partition pruning rule (fires on SQL plans too,
  * KeyPartitionPruneSpec). */
object Catalog {

  /** Register `region … embeddings` plus `events_log` / `clicks_log`. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Tables.All.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    RecordLog.topic(spark, sfDir, "events").createOrReplaceTempView("events_log")
    RecordLog.topic(spark, sfDir, "clicks").createOrReplaceTempView("clicks_log")
  }
}
