package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-language corpus telemetry: document counts, total characters,
  * and EXACT length percentiles (p10/p50/p90/p99) — the distribution
  * report a curation run publishes before and after each filtering
  * stage (length-filter thresholds are typically set from exactly this
  * table).
  *
  * Percentiles are exact ORDER STATISTICS, not interpolated: the value
  * at 0-based sorted index `floor(p·(n−1))`. Selection never averages,
  * so every reported number is an integer that exists in the data, and
  * oracle parity is trivial (the one float op, `p·(n−1)`, is a single
  * IEEE multiply fed to floor — identical in both engines; equal-value
  * ties make the picked VALUE independent of their ordering).
  *
  * Scale shape: one hash exchange on lang feeds both windows (rank and
  * per-key count share the partitioning — the q29 rule), then a
  * partial/final aggregate. Exact per-key order statistics
  * fundamentally require the per-key sort; at 100 TB that is a real
  * per-language sort (Spark's spill-safe sort-based window — correct,
  * just not cheap), and a pipeline that needs this per-stage rather
  * than per-release would swap in a mergeable sketch (t-digest /
  * KLL) accepting approximation — that variant is deliberately NOT
  * the oracle-checked one, since sketches are not bit-reproducible
  * across engines. */
object CorpusStats {

  val Percentiles: Seq[(Double, String)] =
    Seq(0.10 -> "p10", 0.50 -> "p50", 0.90 -> "p90", 0.99 -> "p99")

  def lengthReport(docs: DataFrame, langCol: String,
      lenCol: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val ranked = docs
      .select(col(langCol).as("lang"), col(lenCol).cast("long").as("len"))
      .withColumn("rn", row_number().over(byLang.orderBy("len")))
      .withColumn("n", count(lit(1)).over(byLang))
    val pCols = Percentiles.map { case (p, name) =>
      max(when(col("rn") === (floor(lit(p) * (col("n") - 1)) + 1).cast("long"),
        col("len"))).as(name)
    }
    val aggCols = Seq(sum("len").as("total_chars")) ++ pCols
    ranked.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), aggCols: _*)
      .orderBy("lang")
  }

  /** DuckDB oracle for [[lengthReport]] over table `documents`. */
  def oracleSql: String = {
    // CAST($p AS DOUBLE) is load-bearing: a bare decimal literal would
    // make DuckDB compute the index in exact DECIMAL while Spark's
    // lit(p) multiplies in double — for percentiles whose double product
    // lands just under an integer (e.g. 0.29 × 100 = 28.999…96) the two
    // floors would disagree by one rank. Forcing double on both sides
    // makes it the same single IEEE multiply.
    val pSelects = Percentiles.map { case (p, name) =>
      s"max(CASE WHEN rn = CAST(floor(CAST($p AS DOUBLE) * (n - 1)) AS BIGINT) + 1 THEN len END) AS $name"
    }.mkString(",\n       |  ")
    s"""WITH r AS (
       |  SELECT lang, n_chars AS len,
       |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len) AS BIGINT) AS total_chars,
       |  $pSelects
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin
  }
}
