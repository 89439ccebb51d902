package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Conformance, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All query logic lives in [[graft.queries.Conformance]] (Q1–Q18, the
  * reference's operator surface) and [[graft.queries.PipelineQueries]]
  * (LLM-data-pipeline operators); this object only aggregates the Maps.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Conformance.queries("q01_scan")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Conformance.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Conformance.oracle ++ PipelineQueries.oracle
}
