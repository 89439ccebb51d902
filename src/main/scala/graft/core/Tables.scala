package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md). All
  * reads go through here so filters/projections stay directly above the
  * parquet scan and Catalyst can push them down.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp ([PARQUET_TYPE_ILLEGAL]). We read it as a long
    * (`nanosAsLong`, runtime-settable) and truncate to microseconds — the
    * fixture's values are µs-aligned (verified: epoch_ns % 1000 == 0
    * everywhere), and DuckDB's parquet reader performs the same ns→µs
    * truncation, so both engines see identical timestamps.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
    // The other fixtures' ms timestamps arrive as TIMESTAMP_NTZ (parquet
    // isAdjustedToUTC=false); normalize to TIMESTAMP — the session runs in
    // UTC, so the instant is unchanged, and downstream epoch-millis /
    // window functions expect the LTZ type.
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast("timestamp"))
    }
  }
}
