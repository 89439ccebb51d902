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

  /** Fixed-context sequence manifest: the sample map a training loader
    * needs when documents are concatenated in `idCol` order into one
    * token stream and cut into `ctxLen`-token training sequences — for
    * every (sequence, document) incidence, where in the document and
    * where in the sequence the copied run sits. Unlike [[assign]]
    * (shards never split a document), a document STRADDLING a sequence
    * boundary contributes a row per touched sequence — the standard
    * packed-pretraining layout, where sample k is tokens
    * `[k*ctxLen, (k+1)*ctxLen)` of the stream.
    *
    * Scale shape: the same [[ScalableCumSum]] two-pass prefix sum as
    * [[assign]] (no one-partition window), then a map-side explode of
    * `n_tokens/ctxLen + 1` rows per document — output is linear in
    * corpus tokens over `ctxLen`, and nothing reshuffles after the
    * cumsum's range partition; the manifest comes back unordered, and
    * callers that need a deterministic listing order it themselves (the
    * conformance harness sorts by (seq_id, doc_id) for the oracle
    * compare). Zero-token documents are excluded up front (they occupy
    * no stream positions).
    *
    * Output: (seq_id, doc_id, doc_off, seq_off, len) — tokens
    * `[doc_off, doc_off+len)` of the document land at
    * `[seq_off, seq_off+len)` of sequence `seq_id`. */
  def sequenceManifest(docs: DataFrame, idCol: String, tokens: Column,
      ctxLen: Long, numPartitions: Int = 32): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    val base = docs.select(col(idCol).as("doc_id"),
        tokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    ScalableCumSum.addCumSum(base, Seq("doc_id"), "n_tokens", "start_tok",
        numPartitions)
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        explode(sequence(expr(s"start_tok div $ctxLen"),
          expr(s"(start_tok + n_tokens - 1) div $ctxLen"))).as("seq_id"))
      .select(
        col("seq_id"),
        col("doc_id"),
        greatest(col("seq_id") * ctxLen - col("start_tok"), lit(0L)).as("doc_off"),
        greatest(col("start_tok") - col("seq_id") * ctxLen, lit(0L)).as("seq_off"),
        (least((col("seq_id") + 1) * ctxLen, col("start_tok") + col("n_tokens"))
          - greatest(col("seq_id") * ctxLen, col("start_tok"))).as("len"))
  }

  /** DuckDB oracle for [[sequenceManifest]] over table `documents` with
    * whitespace token counts (window-form cumsum — correct, not the
    * scale shape). */
  def sequenceOracleSql(ctxLen: Long): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_tok
       |  FROM toks WHERE n_tokens > 0),
       |e AS (
       |  SELECT doc_id, n_tokens, start_tok,
       |    unnest(range(start_tok // $ctxLen,
       |                 (start_tok + n_tokens - 1) // $ctxLen + 1)) AS seq_id
       |  FROM c)
       |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       |  CAST(greatest(seq_id * $ctxLen - start_tok, 0) AS BIGINT) AS doc_off,
       |  CAST(greatest(start_tok - seq_id * $ctxLen, 0) AS BIGINT) AS seq_off,
       |  CAST(least((seq_id + 1) * $ctxLen, start_tok + n_tokens)
       |       - greatest(seq_id * $ctxLen, start_tok) AS BIGINT) AS len
       |FROM e ORDER BY seq_id, doc_id""".stripMargin

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
