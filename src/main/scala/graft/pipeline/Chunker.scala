package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking (round 15) — the preprocessing grain
  * for retrieval corpora and context-window training: each document
  * splits into overlapping windows of `size` whitespace tokens advancing
  * by `stride` (stride < size ⇒ overlap = size − stride tokens, the
  * standard RAG layout; stride = size ⇒ disjoint blocks).
  *
  * Chunk identity is (doc_id, chunk_idx) with chunk_idx = start/stride —
  * stable across runs, so chunk-grain sidecars (embeddings, BM25
  * postings) can land incrementally under the same keys.
  *
  * Scale shape: one narrow scan — tokenize once per row, bind the array
  * through a higher-order transform, explode. No shuffle, no UDF; the
  * output is chunk-grain (deliberately larger than the input — that is
  * the product). Windows start at every multiple of `stride` below the
  * token count, so every token lands in ≥1 chunk and tail windows may
  * hold fewer than `size` tokens; empty documents emit no chunks.
  */
object Chunker {

  def chunks(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame =
    chunksUnordered(docs, idCol, textCol, size, stride)
      .orderBy("doc_id", "chunk_idx")

  /** [[chunks]] without the presentation sort — the composition form
    * ([[chunkCorpus]] feeds shuffling consumers; a global sort before a
    * shuffle would execute and buy nothing). */
  private def chunksUnordered(docs: DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        expr(s"regexp_extract_all($textCol, '\\\\S+', 0)").as("toks"))
      .select(col("doc_id"), expr("size(toks)").as("n_toks"), col("toks"))
      .filter(col("n_toks") > 0)
      .select(col("doc_id"),
        explode_outer(expr(
          s"""transform(
             |  sequence(0, CAST(ceil(n_toks / CAST($stride AS DOUBLE)) AS INT) - 1),
             |  i -> struct(
             |    CAST(i AS BIGINT) AS chunk_idx,
             |    array_join(slice(toks, i * $stride + 1, $size), ' ') AS chunk_text,
             |    CAST(least($size, n_toks - i * $stride) AS BIGINT) AS n_tokens))"""
            .stripMargin)).as("c"))
      .filter(col("c").isNotNull)
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"), col("c.n_tokens").as("n_tokens"))
  }

  /** Cross-document repeated-chunk report over [[chunks]]: canonical
    * chunk classes (md5 of the chunk text — chunks are already
    * whitespace-normalized by construction) appearing in ≥ `minDocs`
    * DISTINCT documents, with occurrence counts — the chunk-grain
    * duplication telemetry a retrieval corpus wants before embedding
    * anything (embedding 40 copies of one boilerplate window is paid 40
    * times). Only FULL windows participate: a tail fragment of the same
    * run would otherwise count as a distinct class per offset. Slim
    * exchange: (md5, doc_id) only, never chunk text. */
  def repeatedChunks(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int, minDocs: Int): DataFrame =
    chunksUnordered(docs, idCol, textCol, size, stride)
      .filter(col("n_tokens") === size)
      .select(md5(col("chunk_text")).as("ckey"), col("doc_id"))
      .groupBy("ckey")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .orderBy("ckey")

  /** Chunk-id packing: (doc_id, chunk_idx) → one BIGINT key, so the
    * chunk grain can flow through every id-keyed operator (BM25, ANN,
    * dedup) unchanged. 2^20 windows per doc is `require`d — at stride
    * 16 that is a ~16M-token document. */
  val ChunkIdShift = 20

  /** [[chunks]] re-keyed as a CORPUS: `(doc_id, text)` where doc_id is
    * the packed chunk id — the composition adapter that turns any
    * document-grain operator into its chunk-grain form (q127 runs BM25
    * over exactly this frame; the RAG deployment shape, where retrieval
    * returns windows, not whole documents). */
  def chunkCorpus(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame =
    chunksUnordered(docs, idCol, textCol, size, stride)
      .select((col("doc_id") * (1L << ChunkIdShift) +
        when(col("chunk_idx") < (1L << ChunkIdShift), col("chunk_idx"))
          .otherwise(expr(s"raise_error(CONCAT('chunk_idx ', chunk_idx, " +
            s"' exceeds the ${1 << ChunkIdShift}-windows-per-doc id pack'))")))
        .as("doc_id"),
        col("chunk_text").as("text"))

  /** DuckDB rendering of [[chunkCorpus]] — a plain derived table
    * (nested subselects, no CTE) so it can splice into any oracle's
    * `corpusSql` slot. */
  def chunkCorpusSql(size: Int, stride: Int): String =
    s"""(SELECT doc_id * ${1L << ChunkIdShift} + i AS doc_id,
       |   array_to_string(t[i * $stride + 1 : i * $stride + $size], ' ') AS text
       | FROM (SELECT doc_id, t, n,
       |         unnest(range(0, CAST(ceil(n / CAST($stride AS DOUBLE)) AS BIGINT))) AS i
       |       FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t,
       |                    len(regexp_extract_all(text, '\\S+')) AS n
       |             FROM documents)
       |       WHERE n > 0))""".stripMargin

  /** The shared chunk CTE (DuckDB): per (doc, window) the slice bounds.
    * `unnest(range(...))` runs in the SELECT clause (scalar `range`
    * yields a list), sidestepping correlated-lateral table functions. */
  private def chunkCteSql(size: Int, stride: Int): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t,
       |         len(regexp_extract_all(text, '\\S+')) AS n
       |  FROM documents),
       |win AS (
       |  SELECT doc_id, t, n,
       |    unnest(range(0, CAST(ceil(n / CAST($stride AS DOUBLE)) AS BIGINT))) AS i
       |  FROM toks WHERE n > 0),
       |ch AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |    array_to_string(t[i * $stride + 1 : i * $stride + $size], ' ') AS chunk_text,
       |    CAST(least($size, n - i * $stride) AS BIGINT) AS n_tokens
       |  FROM win)""".stripMargin

  /** DuckDB oracle for [[chunks]] on table `documents`. */
  def oracleSql(size: Int, stride: Int): String =
    s"""WITH ${chunkCteSql(size, stride)}
       |SELECT doc_id, chunk_idx, chunk_text, n_tokens
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** DuckDB oracle for [[repeatedChunks]] on table `documents`. */
  def repeatedOracleSql(size: Int, stride: Int, minDocs: Int): String =
    s"""WITH ${chunkCteSql(size, stride)}
       |SELECT md5(chunk_text) AS ckey, count(DISTINCT doc_id) AS n_docs,
       |  count(*) AS n_occurrences, min(doc_id) AS first_doc
       |FROM ch WHERE n_tokens = $size
       |GROUP BY 1 HAVING count(DISTINCT doc_id) >= $minDocs
       |ORDER BY ckey""".stripMargin
}
