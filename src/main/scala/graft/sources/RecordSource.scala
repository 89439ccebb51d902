package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.log.RecordLog

/** The source seam (SURVEY.md §7.1): the whole query pipeline
  * ([[graft.log.LogQuery.consumedFrom]]) operates on any DataFrame with
  * the record schema
  *
  *   topic string, partition int, offset long, timestamp long (epoch ms),
  *   key string, value string
  *
  * so a binding only has to produce that shape.
  */
trait RecordSource {
  def records(spark: SparkSession, topics: Seq[String]): DataFrame
}

/** The testable binding: deterministic parquet stand-in (FIXTURES.md §B.1). */
final class ParquetLogSource(sfDir: String) extends RecordSource {
  override def records(spark: SparkSession, topics: Seq[String]): DataFrame =
    RecordLog.topics(spark, sfDir, topics)
}

/** The real-Kafka binding. The sandbox ships no `spark-sql-kafka`
  * connector jar and no broker, so this is interface-only: it documents
  * the exact option mapping and fails fast when invoked.
  *
  * With the connector present the implementation is:
  * {{{
  * spark.read.format("kafka")
  *   .option("kafka.bootstrap.servers", servers)
  *   .option(assignJson(topics, partitions))       // A1/A2 pruning
  *   .option("startingOffsets", startJson)         // A3/A4 seek
  *   .option("endingOffsets", "latest")            // S5 snapshot bound
  *   .load()
  *   .select(col("topic"), col("partition"), col("offset"),
  *     (col("timestamp").cast("double") * 1000).cast("long").as("timestamp"),
  *     col("key").cast("string"), col("value").cast("string"))
  * }}}
  * (deserializer plug point: replace the casts with `msgpack_decode` /
  * Confluent-wire decoding per `QueryOptions.keyDeserializer`.)
  */
final class KafkaRecordSource(bootstrapServers: String) extends RecordSource {
  override def records(spark: SparkSession, topics: Seq[String]): DataFrame =
    throw new UnsupportedOperationException(
      "spark-sql-kafka connector is not on the classpath in this environment; " +
        "see scaladoc for the binding")
}
