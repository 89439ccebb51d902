package graft.log

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions

/** The deterministic parquet stand-in for a partitioned Kafka topic
  * (FIXTURES.md §B.1) mirroring the reference's 6-field record model
  * (`/root/reference/src/kbrowse/search.clj:34-42`): every `events` row
  * becomes a record on topic "events", placed on one of 10 partitions by
  * the same murmur2 placement Kafka's DefaultPartitioner would use
  * (`/root/reference/src/kbrowse/kafka.clj:59-70`), with per-partition
  * offsets assigned in `(ts, event_id)` order.
  *
  * Schema: topic string, partition int, offset long, timestamp long
  * (epoch millis, like the reference's `.timestamp`), key string,
  * value string.
  *
  * Scale note: the one shuffle here is the `row_number` window keyed by
  * `partition` — exactly the topic's own partitioning, so on a real
  * Kafka-backed cluster this column arrives free from the source and the
  * whole mapping is shuffle-less. The materialized log is cached per
  * `(session, sfDir)` so the ~20 conformance queries share one scan.
  */
object RecordLog {
  val NumPartitions = 10

  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** The primary "events" topic. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    topic(spark, sfDir, "events")

  /** A topic of the record-log family: "events" is the full table;
    * "clicks" is the click-only slice published as its own topic (used by
    * the multi-topic union conformance query, FIXTURES.md §C Q2). */
  def topic(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), build(spark, sfDir, name).cache())

  private def build(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftFunctions.register(spark)
    val ev0 = Tables.load(spark, sfDir, "events")
    val ev = name match {
      case "events" => ev0
      case "clicks" => ev0.filter(col("event_type") === "click")
      case other => throw new IllegalArgumentException(s"unknown topic: $other")
    }
    val w = Window.partitionBy(col("partition")).orderBy(col("ts"), col("event_id"))
    ev.select(
        col("ts"),
        col("event_id"),
        col("user_id").cast("string").as("key"),
        col("props").as("value"))
      .withColumn("partition", GraftFunctions.kafkaPartition("key", NumPartitions))
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
      .select(
        lit(name).as("topic"),
        col("partition"),
        col("offset"),
        unix_millis(col("ts").cast("timestamp")).as("timestamp"),
        col("key"),
        col("value"))
  }

  /** Multi-topic scan (SURVEY §2.1 S2): union of per-topic logs. */
  def topics(spark: SparkSession, sfDir: String, names: Seq[String]): DataFrame =
    names.map(topic(spark, sfDir, _)).reduce(_ union _)
}
