package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** Self-trained bigram language-model scoring — the KenLM-style
  * perplexity filter of a training pipeline, re-expressed log-free: train
  * bigram statistics on the corpus itself, then score every document by
  * the average conditional probability `P(w2 | w1)` of its adjacent word
  * pairs. Natural text repeats the corpus's transitions (high average
  * conditional probability); shuffled words, tokenizer shred, and
  * machine-generated noise step through rare transitions. Complements
  * [[TermCommonness]] (q72), which scores UNIGRAM occurrence frequency
  * and is blind to word ORDER — a scrambled copy of a clean document
  * scores identically under q72 but collapses here.
  *
  * Scoring is LOG-FREE and division-deferred for the [[TfIdf]] reason
  * (transcendentals are not bit-reproducible across engines), with one
  * extra wrinkle: conditional probabilities have per-bigram denominators,
  * so the per-doc sum cannot be left as raw IEEE doubles (float addition
  * order across partitions is not deterministic). Each distinct bigram's
  * conditional probability is therefore lifted to a 2^20 fixed-point
  * integer — `floor(2^20 · c(w1 w2) / c(w1 ·))`, one IEEE multiply +
  * divide + floor, bit-identical in any engine — and per-doc sums run in
  * exact integer arithmetic until one final division.
  *
  * Scale shape: ONE tokenize→explode feeds the (doc, gram) count
  * aggregate, MATERIALIZED because both the model-side rollups and the
  * scoring join consume it (corpus tokenized exactly once — the
  * [[TfIdf.topTerms]] convention). The gram-total rollup is materialized
  * too: it feeds BOTH the context rollup and the probability join, and
  * it is vocabulary-sized (sublinear in corpus), so the second cache is
  * cheap insurance against re-aggregating the corpus-scale doc-gram
  * frame twice. Model joins are gram-/context-keyed with no broadcast
  * hint (a 100 TB corpus's bigram vocabulary is not driver-sized; AQE
  * picks the strategy). Every post-explode row is slim counts — text
  * never reshuffles — and the final rollup shuffles one row per distinct
  * (doc, gram), bounded by document vocabulary, not corpus size.
  */
object BigramModel {

  /** Fixed-point scale for conditional probabilities (2^20 ≈ 6 decimal
    * digits — far finer than the count noise in any corpus-trained LM). */
  val Scale: Long = 1L << 20

  /** (doc_id, n_bigrams, sum_cond_fp, avg_cond_prob, novel_grams) for
    * every document with ≥ 2 whitespace tokens (i.e. ≥ 1 full bigram
    * window, [[graft.functions.WordGramsExpr]] lowercased tokenization):
    *  - `n_bigrams`: the doc's bigram OCCURRENCES;
    *  - `sum_cond_fp`: Σ over occurrences of the 2^20 fixed-point
    *    corpus conditional `floor(2^20·c(w1w2)/c(w1·))`, exact integers;
    *  - `avg_cond_prob`: the average conditional probability, one final
    *    IEEE division (≈ 1/perplexity of a unigram-context LM);
    *  - `novel_grams`: distinct bigrams ALL of whose corpus occurrences
    *    are this doc's own (`c2 == c_dg`) — the novelty tail that no
    *    other document shares. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // explode_outer + isnotnull (r22): the non-outer generate's inferred
    // filter re-evaluated word_grams per corpus row (see Winnow.decontam).
    val grams = docs.select(col(idCol).cast("long").as("doc_id"),
        explode_outer(graft.functions.GraftFunctions.wordGrams(col(textCol), 2))
          .as("gram"))
      .filter(col("gram").isNotNull)
    // Materialized: feeds the model rollups AND the scoring join.
    val docGram = Materialize.barrier(
      grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c_dg")))
    // Vocabulary-sized; feeds the context rollup AND the probability join.
    val gramTotals = Materialize.barrier(
      docGram.groupBy("gram").agg(sum("c_dg").as("c2")))
    val ctx = gramTotals
      .groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"))
    val probs = gramTotals
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(ctx, "w1")
      .select(col("gram"), col("c2"),
        floor(lit(Scale.toDouble) * col("c2") / col("c1")).cast("long")
          .as("p_fp"))
    docGram.join(probs, "gram")
      .groupBy("doc_id")
      .agg(sum("c_dg").as("n_bigrams"),
        sum(col("c_dg") * col("p_fp")).as("sum_cond_fp"),
        sum(when(col("c2") === col("c_dg"), 1L).otherwise(0L))
          .as("novel_grams"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_cond_fp"),
        (col("sum_cond_fp").cast("double") /
          (col("n_bigrams") * lit(Scale)).cast("double")).as("avg_cond_prob"),
        col("novel_grams"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[score]] over table `documents`. The fixed-point
    * lift is the same three IEEE ops (`DOUBLE * BIGINT`, `/`, `floor`)
    * in the same order as the Spark plan's; sums are HUGEINT in DuckDB —
    * cast back to BIGINT before the schema compare. */
  def oracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
       |  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)
       |  WHERE len(t) >= 2),
       |doc_gram AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c_dg
       |  FROM grams GROUP BY doc_id, gram),
       |gram_totals AS (
       |  SELECT gram, CAST(sum(c_dg) AS BIGINT) AS c2
       |  FROM doc_gram GROUP BY gram),
       |ctx AS (
       |  SELECT split_part(gram, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
       |  FROM gram_totals GROUP BY 1),
       |probs AS (
       |  SELECT gram, c2,
       |         CAST(floor(${Scale}.0 * c2 / c1) AS BIGINT) AS p_fp
       |  FROM gram_totals JOIN ctx ON split_part(gram, ' ', 1) = ctx.w1)
       |SELECT doc_id,
       |       CAST(sum(c_dg) AS BIGINT) AS n_bigrams,
       |       CAST(sum(c_dg * p_fp) AS BIGINT) AS sum_cond_fp,
       |       CAST(CAST(sum(c_dg * p_fp) AS BIGINT) AS DOUBLE)
       |         / CAST(CAST(sum(c_dg) AS BIGINT) * $Scale AS DOUBLE)
       |         AS avg_cond_prob,
       |       CAST(sum(CASE WHEN c2 = c_dg THEN 1 ELSE 0 END) AS BIGINT)
       |         AS novel_grams
       |FROM doc_gram JOIN probs USING (gram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
