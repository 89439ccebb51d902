package graft.log

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Topic archive (tiered storage): a record-log topic materialized ONCE as
  * partition-directory parquet — the lake layout of a compacted/archived
  * Kafka topic.
  *
  * Why it matters at 100 TB: in the live stand-in, `partition` is a
  * COMPUTED column, so `--partitions 3,5` filters after the scan. In the
  * archive, `partition` is the directory key: the same predicate becomes
  * directory-level partition pruning (`PartitionFilters` on the scan — a
  * scan of 2/10ths of the data), and offset/timestamp predicates hit
  * parquet row-group min/max. Archive once, then every exploratory query
  * pays only for what it touches.
  */
object LogStore {

  /** Archive topics under `storeDir/<topic>/partition=<p>/...`. */
  def materialize(spark: SparkSession, sfDir: String, storeDir: String,
      topics: Seq[String] = Seq("events", "clicks")): Unit =
    topics.foreach { t =>
      RecordLog.topic(spark, sfDir, t)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("partition")
        .parquet(s"$storeDir/$t")
    }

  /** Read an archived topic back in the canonical record-column order.
    * Partition predicates prune directories; offset/timestamp predicates
    * push to parquet. */
  def topic(spark: SparkSession, storeDir: String, name: String): DataFrame =
    spark.read.parquet(s"$storeDir/$name")
      .select(col("topic"),
        col("partition").cast("int").as("partition", RecordLog.partitionMeta),
        col("offset"), col("timestamp"), col("key"), col("value"))
}
