package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency quality scoring: score each document by how COMMON
  * its tokens are in the corpus itself — the self-trained unigram
  * language-model proxy (the CCNet-style "does this read like the rest
  * of the corpus" filter). Natural-text documents are dominated by
  * high-frequency tokens; tokenizer garbage, boilerplate IDs, and
  * non-linguistic noise are dominated by near-singletons, so a LOW
  * average corpus frequency flags junk for the curation cut.
  *
  * Scoring is LOG-FREE for the same reason as [[TfIdf]]: the classic
  * per-token log-prob `avg ln(c_t/total)` is not bit-reproducible across
  * engines, while `avg_term_freq = Σ_occurrences c_token / n_tokens` is
  * exact integer arithmetic until one final IEEE division — hash-checkable
  * against the oracle and monotone in the same signal (it is the
  * arithmetic rather than geometric mean of token probabilities, scaled
  * by the constant corpus total).
  *
  * Scale shape: ONE tokenize→explode feeds one (doc, term) count
  * aggregate, MATERIALIZED (query-lifetime cache + count barrier, the
  * [[TfIdf.topTerms]] convention) because both the vocabulary rollup and
  * the scoring join consume it — corpus scanned and tokenized exactly
  * once. The vocabulary join is term-keyed with no broadcast hint (a
  * 100 TB corpus's vocabulary is not driver-sized; AQE picks the
  * strategy), and every post-explode row is counts only — no text
  * reshuffles. The final per-doc rollup shuffles one row per distinct
  * (doc, term), bounded by document vocabulary, not corpus size.
  */
object TermCommonness {

  /** (doc_id, n_tokens, sum_term_freq, avg_term_freq) for every document
    * with ≥ 1 whitespace token: `sum_term_freq` totals, over the doc's
    * token OCCURRENCES, each token's corpus-wide occurrence count
    * (lowercased unigrams — [[Decontam.wordGrams]] n=1 tokenization);
    * `avg_term_freq` divides by the doc's token count. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(idCol).as("doc_id"),
        explode_outer(graft.functions.GraftFunctions.wordGrams(col(textCol), 1)).as("term"))
      .filter(col("term").isNotNull)
    // Materialized: feeds the vocabulary rollup AND the scoring join
    // (see scaladoc; TfIdf's single-scan convention, PlanAuditSpec class).
    val docTerm = graft.ops.Materialize.barrier(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("c_dt")))
    val vocab = docTerm.groupBy("term").agg(sum("c_dt").as("c_t"))
    docTerm.join(vocab, "term")
      .groupBy("doc_id")
      .agg(sum("c_dt").as("n_tokens"),
        sum(col("c_dt") * col("c_t")).as("sum_term_freq"))
      .select(col("doc_id"),
        col("n_tokens"),
        col("sum_term_freq"),
        (col("sum_term_freq").cast("double") / col("n_tokens").cast("double"))
          .as("avg_term_freq"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[score]] over table `documents`. DuckDB
    * `sum(BIGINT)` is HUGEINT — cast back to BIGINT before the schema
    * compare; the division is the same two exact-integer-valued doubles
    * as the Spark plan's. */
  def oracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
       |  FROM documents),
       |doc_term AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c_dt
       |  FROM toks GROUP BY doc_id, term),
       |vocab AS (
       |  SELECT term, CAST(sum(c_dt) AS BIGINT) AS c_t
       |  FROM doc_term GROUP BY term)
       |SELECT doc_id,
       |       CAST(sum(c_dt) AS BIGINT) AS n_tokens,
       |       CAST(sum(c_dt * c_t) AS BIGINT) AS sum_term_freq,
       |       CAST(CAST(sum(c_dt * c_t) AS BIGINT) AS DOUBLE)
       |         / CAST(CAST(sum(c_dt) AS BIGINT) AS DOUBLE) AS avg_term_freq
       |FROM doc_term JOIN vocab USING (term)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
