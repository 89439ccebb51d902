package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Exact corpus heavy hitters through a Misra–Gries gate: every token
  * whose total count strictly exceeds `N / k` (N = total corpus tokens),
  * with its EXACT count — without ever shuffling the full token
  * frequency table.
  *
  * The naive shape (`explode → groupBy(term) → having`) exchanges one
  * row per distinct term — at 100 TB that is a vocabulary-sized shuffle
  * (billions of keys, dominated by the long tail that can never be a
  * heavy hitter). Here the tail dies map-side:
  *
  *   1. **Sketch pass**: each partition runs a Misra–Gries summary with
  *      m = k counters over its token stream (`mapPartitions`, O(m)
  *      state, amortized O(1) per token). MG's guarantee: any token
  *      with local frequency > n_p/(m+1) survives partition p's
  *      summary. A global heavy hitter (cnt·k > N) must, by pigeonhole
  *      over ratios, have local cnt_p·k > n_p in SOME partition, and
  *      m = k ⇒ n_p/k ≥ n_p/(m+1), so it survives there — the
  *      candidate union (≤ m rows per partition) is a SUPERSET of the
  *      true heavy hitters. False candidates are fine; false misses
  *      cannot happen.
  *   2. **Exact pass**: the candidate set (≤ partitions·k rows)
  *      broadcasts as a left-semi join onto a second token scan, so
  *      non-candidates are dropped before the aggregation exchange —
  *      the only term-keyed shuffle carries candidates only.
  *   3. **Threshold**: N comes from a one-row `sum(size(tokens))`
  *      aggregate (map-side, no explode) broadcast-crossed onto the
  *      candidate counts; `cnt · k > N` keeps the true hitters.
  *
  * The output is EXACT and deterministic — the sketch only gates which
  * terms reach the exact count, never the counts themselves — so the
  * DuckDB oracle is the plain quadratic-shuffle formulation.
  *
  * Reference seam: kbrowse has no aggregation surface (its closest
  * analog is the regex value filter, `/root/reference/src/kbrowse/
  * search.clj:68-78`); this operator is part of the §2.6 analytics
  * generalization, tokenized identically to [[Vocabulary]]
  * (lowercased `\S+` unigrams).
  */
object HeavyHitters {

  /** (term, cnt) for every word `n`-gram with cnt·k > total n-grams,
    * ordered by (cnt DESC, term ASC). */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
      n: Int = 2): DataFrame = {
    require(k >= 2, s"heavy-hitter threshold divisor must be >= 2: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val toks = docs.select(
        explode_outer(GraftFunctions.wordGrams(col(textCol), n)).as("term"))
      .filter(col("term").isNotNull)
    // Sketch pass: per-partition Misra–Gries, m = k counters.
    val candidates = partitionSummaries(toks.as[String], k)
      .select("term").distinct()
    // Exact pass: candidates gate the aggregation map-side.
    val exact = toks.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // Total n-grams: map-side array size, one-row aggregate.
    val total = docs.select(
      sum(size(GraftFunctions.wordGrams(col(textCol), n))).cast("long")
        .as("n_total"))
    exact.crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
  }

  /** Per-partition Misra–Gries summaries over a token stream: ≤ m
    * `(term, residual_count)` rows per partition. The residuals are the
    * textbook MG counters — for any term, `residual ∈ [exact_p −
    * n_p/(m+1), exact_p]` within its partition — which makes the frames
    * MERGEABLE (Agarwal et al., PODS'12): summing summaries and
    * re-reducing preserves the N/(m+1) global error bound. [[heavyHitters]]
    * consumes only the keys (its second pass is exact anyway);
    * [[graft.streaming.StreamHitters]] merges the counters across
    * micro-batches. */
  private[graft] def partitionSummaries(
      toks: org.apache.spark.sql.Dataset[String], m: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long](m * 2)
      it.foreach { t =>
        val c = counts.getOrDefault(t, 0L)
        if (c > 0L) counts.put(t, c + 1L)
        else if (counts.size < m) counts.put(t, 1L)
        else {
          // decrement-all; drop zeros (the MG step — amortized O(1):
          // each decrement cancels one earlier increment). The incoming
          // token is discarded, per the textbook update.
          val e = counts.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      counts.entrySet().iterator().asScala.map(kv => (kv.getKey, kv.getValue.longValue()))
    }.toDF("term", "residual")
  }

  /** DuckDB oracle for [[heavyHitters]] over table `documents` — the
    * full-vocabulary-shuffle formulation the operator avoids. */
  def oracleSql(k: Int, n: Int = 2): String =
    s"""WITH tok_arrays AS (
       |  SELECT regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
       |toks AS (
       |  SELECT unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS term
       |  FROM tok_arrays),
       |tot AS (SELECT count(*) AS n_total FROM toks)
       |SELECT term, CAST(count(*) AS BIGINT) AS cnt
       |FROM toks CROSS JOIN tot
       |GROUP BY term, n_total
       |HAVING count(*) * $k > n_total
       |ORDER BY cnt DESC, term ASC""".stripMargin
}
