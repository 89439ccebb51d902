package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** Corpus vocabulary construction + out-of-vocabulary scoring — the
  * tokenizer-prep op of a training pipeline: fix a top-`V` word
  * vocabulary from corpus counts, then report every document's OOV
  * token rate (the signal behind "this document is mostly tokens the
  * tokenizer will shred" drops, and the coverage report a BPE/unigram
  * tokenizer build publishes per corpus release).
  *
  * Selection is deterministic: vocabulary rank orders by (count DESC,
  * term ASC) — the lexicographic tie-break makes the V-boundary
  * bit-stable across engines — and the per-doc rate is exact integer
  * counts until one final IEEE division (the [[TermCommonness]] rule).
  *
  * Scale shape: ONE tokenize→explode feeds the (doc, term) count
  * aggregate, MATERIALIZED because both the vocabulary rollup and the
  * scoring join consume it (corpus tokenized exactly once — the
  * [[TfIdf.topTerms]] convention). The top-V selection is
  * `orderBy(...).limit(V)` — Catalyst's TakeOrderedAndProject, a
  * per-partition bounded heap + driver merge of V rows, never a full
  * sort — and the V-row vocabulary broadcasts back onto the doc-term
  * frame, so the only corpus-scale exchange is the doc-term count's.
  * Per-doc rollup rows are bounded by document vocabulary, not corpus
  * size. */
object Vocabulary {

  /** (doc_id, n_tokens, oov_tokens, oov_rate) per document with ≥1
    * whitespace token, under the top-`v` corpus vocabulary (lowercased
    * unigrams). */
  def oovReport(docs: DataFrame, idCol: String, textCol: String,
      v: Int): DataFrame = {
    require(v > 0, s"vocabulary size must be positive: $v")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        explode_outer(graft.functions.GraftFunctions.wordGrams(col(textCol), 1))
          .as("term"))
      .filter(col("term").isNotNull)
    val docTerm = Materialize.barrier(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("c_dt")))
    val vocab = docTerm.groupBy("term").agg(sum("c_dt").as("c_t"))
      .orderBy(col("c_t").desc, col("term").asc)
      .limit(v)
      .select(col("term"), lit(1).as("in_vocab"))
    docTerm.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum("c_dt").as("n_tokens"),
        coalesce(sum(when(col("in_vocab").isNull, col("c_dt"))), lit(0L))
          .as("oov_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("oov_tokens"),
        (col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[oovReport]] over table `documents`. */
  def oracleSql(v: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
       |  FROM documents),
       |doc_term AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c_dt
       |  FROM toks GROUP BY doc_id, term),
       |vocab AS (
       |  SELECT term FROM (
       |    SELECT term, CAST(sum(c_dt) AS BIGINT) AS c_t
       |    FROM doc_term GROUP BY term)
       |  ORDER BY c_t DESC, term ASC LIMIT $v)
       |SELECT doc_id,
       |  CAST(sum(c_dt) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(sum(CASE WHEN v.term IS NULL THEN c_dt END), 0)
       |    AS BIGINT) AS oov_tokens,
       |  CAST(CAST(coalesce(sum(CASE WHEN v.term IS NULL THEN c_dt END), 0)
       |      AS BIGINT) AS DOUBLE)
       |    / CAST(CAST(sum(c_dt) AS BIGINT) AS DOUBLE) AS oov_rate
       |FROM doc_term dt LEFT JOIN vocab v USING (term)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
