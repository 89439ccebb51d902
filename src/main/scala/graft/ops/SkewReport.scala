package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-skew diagnostics: the per-key load profile that decides BETWEEN
  * the engine's skew tools — broadcast (small side), [[SaltedJoin]] (few
  * known hot keys; the report's `salts` column is the fan-out to pass),
  * or AQE's runtime splitting (long skewed tail). At 100 TB a shuffle
  * join's wall-clock is its hottest task, and the hottest task is the
  * hottest key — this op finds those keys BEFORE the join runs, from one
  * counter-sized aggregation (the profile every salting decision is
  * implicitly made from, made explicit and cheap).
  *
  * Scale shape: one groupBy(key) with map-side combine collapses the
  * table to ≤ |keys| counter rows; the grand total is a 1-row broadcast
  * (never a corpus-wide window); only keys exceeding `targetRowsPerTask`
  * survive the filter, so the result is hot-keys-sized. All arithmetic
  * is exact integers plus one double division for `share`, so the report
  * is bit-identical across engines and partitionings.
  */
object SkewReport {

  /** Keys whose row count exceeds `targetRowsPerTask`, with their corpus
    * share and the [[SaltedJoin]] fan-out (`ceil(n / target)`, exact
    * integer form) that would bound each salted task at ≤ target rows.
    * Hottest first (n desc, key asc). */
  def keyProfile(df: DataFrame, keyCol: String,
      targetRowsPerTask: Long): DataFrame = {
    require(targetRowsPerTask > 0,
      s"targetRowsPerTask must be positive: $targetRowsPerTask")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(totals))
      .filter(col("n") > targetRowsPerTask)
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"),
        expr(s"CAST(((n - 1) div $targetRowsPerTask) + 1 AS INT)").as("salts"))
      .orderBy(col("n").desc, col("key"))
  }

  /** DuckDB oracle for [[keyProfile]] over table `events`, key
    * `event_type`. */
  def oracleSql(keyCol: String = "event_type",
      targetRowsPerTask: Long = 100L): String =
    s"""WITH c AS (
       |  SELECT $keyCol AS key, count(*) AS n FROM events GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
       |SELECT key, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       |  CAST(((n - 1) // $targetRowsPerTask) + 1 AS INT) AS salts
       |FROM c CROSS JOIN t
       |WHERE n > $targetRowsPerTask
       |ORDER BY n DESC, key""".stripMargin
}
