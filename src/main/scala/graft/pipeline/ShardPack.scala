package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScalableCumSum

/** Token-budget shard packing: assign documents to training shards so
  * each shard holds ~`budget` tokens — the layout step that turns a
  * curated corpus into fixed-size training files.
  *
  * The assignment is the deterministic greedy fill: documents are taken
  * in `idCol` order and a document belongs to shard
  * `floor(exclusive_prefix_tokens / budget)` — i.e. the shard its first
  * token lands in. A document longer than the budget simply starts a
  * shard that overflows (standard behavior: shards are ~budget-sized,
  * never split mid-document).
  *
  * The global prefix sum uses [[ScalableCumSum]] (range partition + two
  * passes), NOT `sum() over (order by ...)`, which would serialize the
  * corpus through one window partition.
  */
object ShardPack {

  /** (doc_id, n_tokens, shard) for every document, in doc order. */
  def assign(docs: DataFrame, idCol: String, tokens: Column, budget: Long,
      numPartitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val base = docs.select(col(idCol).as("doc_id"),
      tokens.cast("long").as("n_tokens"))
    ScalableCumSum.addCumSum(base, Seq("doc_id"), "n_tokens", "start_tok",
        numPartitions)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $budget").as("shard"))
  }

  /** DuckDB oracle for [[assign]] over table `documents` with whitespace
    * token counts (the window form — correct, just not the scale shape). */
  def oracleSql(budget: Long): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
       |  FROM toks)
       |SELECT doc_id, n_tokens, CAST(start_tok // $budget AS BIGINT) AS shard
       |FROM c ORDER BY doc_id""".stripMargin
}
