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

/** JSON-lines binding: any directory of JSONL files with the record
  * schema is a topic (one file-set per topic name). Demonstrates that the
  * seam is format-agnostic — the whole LogQuery pipeline runs unchanged
  * over parquet, JSON, in-memory, or (with the connector) Kafka. */
final class JsonLogSource(dir: String) extends RecordSource {
  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("topic", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("partition", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType)))

  override def records(spark: SparkSession, topics: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Explicit schema: JSON inference would both cost a pass and guess
    // value types (the `value` column must STAY a string for the
    // try-parse-JSON record semantic to apply downstream).
    spark.read.schema(schema).json(dir)
      .filter(col("topic").isin(topics: _*))
  }
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
