package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md). All
  * reads go through here so filters/projections stay directly above the
  * parquet scan and Catalyst can push them down.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two fixture generations: parquet
    * TIMESTAMP(NANOS) — which Spark 4 refuses to read as a timestamp
    * ([PARQUET_TYPE_ILLEGAL]), so it arrives as a long under `nanosAsLong`
    * and is truncated to microseconds here — and native TIMESTAMP(MICROS),
    * which arrives as TIMESTAMP_NTZ and only needs the generic LTZ cast
    * below. [[normalizeEventsTs]] dispatches on the READ type so both
    * generations produce the identical normalized schema; DuckDB's parquet
    * reader performs the same ns→µs truncation on the old layout, so both
    * engines see identical timestamps either way.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
    } else spark.read.parquet(s"$sfDir/$name.parquet")
    normalizeEventsTs(df)
  }

  /** Normalize a raw fixture frame to the engine-facing schema: a long
    * `ts` (the TIMESTAMP(NANOS) generation read under `nanosAsLong`) is
    * µs-truncated into a timestamp; then every TIMESTAMP_NTZ column
    * (parquet isAdjustedToUTC=false) is cast to TIMESTAMP — the session
    * runs in UTC, so the instant is unchanged, and downstream
    * epoch-millis / window functions expect the LTZ type. Shared by the
    * batch loader and the streaming readers so the stream sees the exact
    * batch schema. */
  /** Cache key for fixture-derived session artifacts (sidecar tables,
    * materialized /tmp layouts): a fingerprint of the source table's
    * FILE STATE (name, length, mtime of every file under
    * `sfDir/<table>.parquet`), not just the path. Keying on the path
    * alone served stale sidecars after a fixture regeneration at the
    * same location (ADVICE r14) — regenerating the data now changes the
    * key, so the artifact rebuilds instead of silently answering from
    * the old corpus. Pure file metadata: no Spark job, no data read. */
  /** Bump when any sidecar's stored FORMAT changes (columns, layout,
    * retire discipline): the version feeds every fixture table name,
    * so old-format tables persisted in a warehouse are abandoned and
    * rebuilt instead of erroring in the new readers (ADVICE r18 —
    * r17-era gram/winnow/LM sidecars lack the c/src columns the r18+
    * readers select). v2: refcounted gram/winnow + src-tagged additive
    * landings. v3: operation-namespaced marker tags (land:/retire: —
    * a v2 table's unprefixed markers would let this session's prefixed
    * replays re-apply). */
  private val SidecarFormatVersion = 3

  def fixtureKey(sfDir: String, table: String): String = {
    val dir = new java.io.File(s"$sfDir/$table.parquet")
    val files: Seq[java.io.File] =
      if (dir.isDirectory) dir.listFiles().toSeq.sortBy(_.getName)
      else Seq(dir)
    val state = (s"v$SidecarFormatVersion" +: sfDir +: files.map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}")).mkString("|")
    // MD5 over the metadata string: stable across JVMs (String.hashCode
    // would be too, but 32 bits of a structured string invites
    // accidental collisions between rounds' layouts).
    java.security.MessageDigest.getInstance("MD5")
      .digest(state.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }

  def normalizeEventsTs(df: DataFrame): DataFrame = {
    val tsFixed = df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
    tsFixed.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(tsFixed) {
      (d, f) => d.withColumn(f.name, col(f.name).cast("timestamp"))
    }
  }
}
