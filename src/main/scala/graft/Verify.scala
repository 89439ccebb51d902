package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Sidecar tables (the q67 stored-index fixture) land here rather
      // than under a cwd-relative spark-warehouse.
      .config("spark.sql.warehouse.dir", "/tmp/graft-verify-warehouse")
      .config("spark.ui.enabled", "false")
      // Opt-in record-log cache: ~15 conformance queries share one scan of
      // the synthesized log at sf0.01 (general path stays uncached).
      .config("spark.graft.cacheRecordLog", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    // Local-iteration filter (driver sets nothing → full run): a
    // comma-separated list of query-name prefixes to dump.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(ps) =>
        SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A query that fails must surface as a RED row in the driver's
        // correctness report, not silently vanish from it: round 13's
        // fixture break left 22 queries absent and the remaining 51 all
        // green, which reads as a clean gate unless the row COUNT is
        // checked. Dump a sentinel frame whose schema can never match
        // any oracle, so the comparison fails loudly for this query.
        try {
          import spark.implicits._
          Seq(s"$name: ${e.getMessage}".take(500)).toDF("__query_failed")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      // Result fully consumed (written) — release this query's
      // registered query-lifetime caches (graft.ops.Materialize).
      finally graft.ops.Materialize.releaseAll(spark)
    }
    System.err.println(
      s"[verify] dumped ${selected.size - failed}/${selected.size} queries ($failed failed)")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = only match {
      case Some(ps) =>
        SparkEntry.oracleSql.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // A FILTERED run writes its oracle subset to a DISTINCT file
    // (ADVICE r16): overwriting oracle_sql.json with a subset would
    // make a later full comparison over the same outDir silently
    // validate only the subset while looking complete.
    val oracleFile = only match {
      case Some(ps) =>
        System.err.println(
          s"[verify] FILTERED run (SPARK_GRAFT_ONLY=${ps.mkString(",")}) — " +
            "writing oracle_sql_filtered.json, not the full oracle map")
        "oracle_sql_filtered.json"
      case None => "oracle_sql.json"
    }
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    spark.stop()
  }
}
