package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: the `n` documents per stratum with
  * the smallest `md5(doc_id)` — a stable pseudo-random draw that is
  * reproducible across runs, cluster sizes and engines (the hash IS the
  * random order, so there is no RNG state to seed or synchronize).
  *
  * Scale shape: a plain `row_number() over (partition by stratum order by
  * md5)` caps parallelism at the stratum count (a handful of languages
  * over 100 TB = a skew wall). Instead, phase 1 prunes map-side with a
  * bounded heap — each input partition forwards at most `n` rows per
  * stratum it contains, so the shuffle moves ≤ n×P candidate rows per
  * stratum, never the corpus — and phase 2 ranks the tiny survivor set
  * with the exact window. The union of per-partition top-n supersets the
  * global top-n, so the result is exact.
  */
object Sampling {

  /** (stratum, doc_id, rn) with rn = 1..n per stratum in md5 order.
    * The stratum column comes back as STRING whatever its input type
    * (r11: the draw's heap phase runs on a typed tuple encoder — all
    * real strata are language/source strings; a caller sampling on a
    * numeric stratum should cast before joining back). The same
    * contract applies to every mix in this object. */
  def stratified(df: DataFrame, strataCol: String, idCol: String, n: Int)
      : DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    val keyed = df.select(col(strataCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      md5(col(idCol).cast("string")).as("pick"))
    // Ordering is (pick, doc_id) ascending — doc_id breaks md5 ties
    // deterministically; the max-heap evicts the largest = worst.
    heapRank[String](keyed, n,
        Ordering.Tuple2[String, Long],
        Seq(col("pick"), col("doc_id")))
      .select(col("stratum"), col("doc_id"), col("rn"))
      .orderBy("stratum", "doc_id")
  }

  /** The shared two-phase per-stratum top-n rank (used by [[stratified]]
    * and [[Importance.selectTop]]): phase 1 prunes map-side with a
    * bounded heap — each input partition forwards at most `n` rows per
    * stratum it contains, so the shuffle moves ≤ n×P candidate rows per
    * stratum, never the corpus — and phase 2 ranks the survivor set
    * with the exact window. The union of per-partition top-n supersets
    * the global top-n, so the result is exact.
    *
    * `keyed` must be (stratum STRING, doc_id long, key) in that column
    * order — keyed builders cast the stratum (all real strata are
    * language/source strings; the cast is what lets the heap phase run
    * on a codegen'd TUPLE encoder instead of generic Rows, see below);
    * `worstFirst` must rank the WORST row maximal (the heap evicts its
    * max) consistently with `windowOrder`'s best-first ranking. Returns
    * (stratum, doc_id, key, rn ≤ n), unordered.
    *
    * Typed mapPartitions, not `.rdd` (VERDICT r10): the RDD formulation
    * deserialized every corpus row out of Tungsten into a GenericRow and
    * re-validated it back through `createDataFrame`'s runtime
    * converters; the tuple encoder path decodes and re-encodes through
    * generated serializers and keeps the prune inside the Dataset plan
    * (one object boundary, no schema re-validation). Measured at the
    * 64× corpus (SCALING.md r11): equal-or-slightly-faster steady state
    * (q39 0.39-0.41 s vs 0.43-0.65 s) — the draws are overhead-bound
    * there, so the point is the term that GROWS: the per-corpus-row
    * GenericRow decode + runtime re-validation is gone from the scan
    * stage. */
  private[pipeline] def heapRank[K](keyed: DataFrame, n: Int,
      worstFirst: Ordering[(K, Long)],
      windowOrder: Seq[org.apache.spark.sql.Column])(
      implicit kt: scala.reflect.runtime.universe.TypeTag[(String, Long, K)])
      : DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[(String, Long, K)] =
      org.apache.spark.sql.Encoders.product[(String, Long, K)]
    val cols = keyed.columns
    val pruned = keyed.as[(String, Long, K)].mapPartitions { it =>
      val heaps = mutable.HashMap.empty[String, mutable.PriorityQueue[(K, Long)]]
      it.foreach { case (stratum, id, key) =>
        val heap = heaps.getOrElseUpdate(stratum,
          mutable.PriorityQueue.empty(worstFirst))
        heap.enqueue((key, id))
        if (heap.size > n) heap.dequeue()
      }
      heaps.iterator.flatMap { case (stratum, heap) =>
        heap.iterator.map { case (key, id) => (stratum, id, key) }
      }
    }.toDF(cols: _*)
    val w = Window.partitionBy("stratum").orderBy(windowOrder: _*)
    pruned
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  /** Fixed-point weight scale for [[temperatureMix]]: a power of two, so
    * `sqrt(n) * Scale` is an exact exponent shift of the one correctly-
    * rounded operation (IEEE 754 requires sqrt correctly rounded), making
    * the weight bit-reproducible across engines — the same reason the
    * draw key is md5 and not an engine RNG. */
  val MixScale = 1024L

  /** Temperature-scaled mixture resampling (T = 2): draw a corpus of
    * ~`budget` documents whose stratum mix follows p_i ∝ √n_i — the
    * standard multilingual rebalance that upweights rare strata relative
    * to their natural share without letting any single stratum dominate.
    * Quotas are integer arithmetic end to end: w_i = ⌊√n_i · 2¹⁰⌋,
    * quota_i = min(n_i, budget·w_i div Σw_j) — no float sum whose
    * addition ORDER could flip a floor at a quota boundary between
    * engines. Within a stratum the draw is the [[stratified]] md5 order.
    *
    * Scale shape: pass 1 is a map-side-combined count per stratum (tiny
    * result, one exchange of ≤ #strata rows per partition) materialized
    * through [[graft.ops.Materialize]] so the quota plan is computed
    * once; pass 2 reuses [[heapRank]] — per-partition bounded heaps
    * capped at the LARGEST quota, so the rank shuffle moves ≤ maxQuota×P
    * rows per stratum, never the corpus — then a broadcast join applies
    * each stratum's exact quota. The only driver-side values are the
    * max quota (one scalar) and the in-plan overflow guard's constant;
    * #strata (languages / sources) never rides the driver.
    */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val keyed = df.select(col(strataCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      md5(col(idCol).cast("string")).as("pick"))

    // budget·w_i must not overflow a long — raise IN PLAN (the Importance
    // convention) rather than wrap silently in non-ANSI mode. DuckDB's
    // oracle arithmetic goes through HUGEINT, so only Spark needs the guard.
    val wtCap = Long.MaxValue / budget
    val quotas = graft.ops.Materialize.barrier(
      keyed.groupBy("stratum").agg(count(lit(1)).as("n"))
        .withColumn("wt",
          floor(sqrt(col("n").cast("double")) * lit(MixScale)).cast("long"))
        .withColumn("wt", expr(
          s"IF(wt > ${wtCap}L, CAST(raise_error(CONCAT(" +
            s"'temperatureMix: weight ', wt, ' times budget $budget " +
            s"overflows the long quota arithmetic')) AS BIGINT), wt)"))
        .withColumn("total",
          sum(col("wt")).over(Window.partitionBy(lit(1))))
        .withColumn("quota",
          least(col("n"), expr(s"($budget * wt) div total")))
        .select("stratum", "quota"))

    drawByQuota(keyed, quotas)
  }

  /** Explicit-recipe mixture: draw ~`budget` documents whose stratum
    * shares follow a PUBLISHED weight recipe (the DoReMi / data-mixing
    * end product — integer `parts` per stratum, e.g. en→30, de→20),
    * rather than [[temperatureMix]]'s automatic √n rebalance. Quotas are
    * integer-exact: quota_i = min(n_i, budget·part_i div Σparts), with
    * the Σ over the WHOLE recipe — a stratum that saturates (n_i below
    * its quota) leaves its shortfall UNFILLED rather than silently
    * redistributed, so the drawn mix never over-weights another stratum
    * beyond its recipe share; strata absent from the recipe draw zero.
    * (When the shortfall SHOULD be re-spent, [[waterfillMix]] is the
    * same recipe with the redistribution loop baked in.) Same
    * md5 draw, same [[drawByQuota]] scale shape. */
  def targetMix(df: DataFrame, strataCol: String, idCol: String,
      budget: Long, parts: Map[String, Long]): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      s"recipe parts must be positive: $parts")
    val partsTotal = parts.values.sum
    parts.values.foreach(p => require(p <= Long.MaxValue / budget,
      s"part $p times budget $budget overflows the long quota arithmetic"))
    val keyed = df.select(col(strataCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      md5(col(idCol).cast("string")).as("pick"))
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = parts.toSeq.toDF("stratum", "part")
    val quotas = graft.ops.Materialize.barrier(
      keyed.groupBy("stratum").agg(count(lit(1)).as("n"))
        .join(broadcast(recipe), "stratum") // inner: unlisted strata drop
        .withColumn("quota",
          least(col("n"), expr(s"($budget * part) div ${partsTotal}L")))
        .select("stratum", "quota"))
    drawByQuota(keyed, quotas)
  }

  /** Token-budget mixture: draw each stratum's md5-ordered prefix whose
    * TOKEN total fits its budget — the units real training recipes are
    * written in ("300B tokens of web, 50B of code"), where
    * [[temperatureMix]]/[[targetMix]]/[[waterfillMix]] draw document
    * COUNTS. A document is kept iff its stratum's exclusive running
    * token sum plus its own tokens stays ≤ the budget (never-exceed:
    * the straddling document is excluded, deterministically — both
    * engines evaluate the same integer comparison). Unlisted strata
    * draw zero; a budget smaller than the first document's tokens
    * draws zero from that stratum.
    *
    * Scale shape: the count-quota mixes rank through a bounded heap
    * because their quotas are driver-small; a TOKEN budget can cover an
    * arbitrary fraction of a corpus-sized stratum, so the prefix sum
    * must scale — [[graft.ops.ScalableRank.addGroupedCumSum]] (the
    * grouped two-pass exclusive sum: range partitions cut THROUGH a hot
    * stratum, per-(partition, stratum) totals prefix-scan distributedly,
    * bases route back, the big side never reshuffles). The budget frame
    * broadcasts; tokens come from a codegen'd count on the scan
    * ([[TextStats.tokenCount]] at the registration). Ordering is the
    * family's (md5(id), doc_id) draw, so the kept prefix is the same
    * stable pseudo-random sample the count mixes draw from. */
  def tokenBudgetMix(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      s"token budgets must be positive: $budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(strataCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      tokensCol.cast("long").as("n_tokens"),
      md5(col(idCol).cast("string")).as("pick"))
    val budgetDf = budgets.toSeq.toDF("stratum", "token_budget")
    val cum = graft.ops.ScalableRank.addGroupedCumSum(
      keyed.join(broadcast(budgetDf), "stratum"), // inner: unlisted drop
      "stratum", Seq("pick", "doc_id"), "n_tokens", "cum_tokens",
      spark.sessionState.conf.numShufflePartitions)
    cum.filter(col("cum_tokens") + col("n_tokens") <= col("token_budget"))
      .select("stratum", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("stratum", "doc_id")
  }

  /** DuckDB oracle for [[tokenBudgetMix]] over `documents`, strata =
    * `lang`, tokens = the whitespace token count (the
    * [[TextStats.tokenCount]] walk): the one-partition window form of
    * the same exclusive prefix + never-exceed comparison. */
  def tokenBudgetMixOracleSql(budgets: Map[String, Long]): String = {
    val values = budgets.toSeq.sortBy(_._1)
      .map { case (s, b) => s"('${s}', ${b}::BIGINT)" }.mkString(", ")
    s"""WITH b(stratum, token_budget) AS (VALUES $values),
       |keyed AS (
       |  SELECT lang AS stratum, doc_id,
       |         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS pick
       |  FROM documents),
       |cum AS (
       |  SELECT k.stratum, k.doc_id, k.n_tokens, b.token_budget,
       |         coalesce(sum(k.n_tokens) OVER (
       |           PARTITION BY k.stratum ORDER BY k.pick, k.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tokens
       |  FROM keyed k JOIN b USING (stratum))
       |SELECT stratum, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM cum WHERE cum_tokens + n_tokens <= token_budget
       |ORDER BY stratum, doc_id""".stripMargin
  }

  /** Redistribution rounds for [[waterfillMix]] — each round can absorb
    * one saturation cascade, so K rounds settle any recipe whose
    * saturations chain at most K deep; whatever integer flooring leaves
    * after K rounds stays UNDRAWN, identically in both engines (the
    * oracle unrolls the same K rounds), preserving determinism over
    * last-row exactness. */
  val WaterfillRounds = 8

  /** [[targetMix]] with the shortfall REDISTRIBUTED: when a stratum
    * saturates (n_i below its recipe quota), the undrawn remainder is
    * re-split across the unsaturated strata by their recipe parts —
    * iteratively, since redistribution can saturate further strata
    * (the classic waterfilling loop, here as [[WaterfillRounds]]
    * unrolled integer rounds). Each round, entirely in-plan over the
    * #strata-row frame (no stratum ever rides the driver — the q57
    * convention):
    *
    *   rem   = budget − Σ q_i                (window sum)
    *   ap    = Σ parts of unsaturated strata (window sum)
    *   q_i  += (rem · part_i) div ap         (unsaturated only)
    *   q_i   = min(n_i, q_i)
    *
    * All arithmetic is long-integer; `rem · part` is guarded by the
    * same `part ≤ Long.MaxValue / budget` require as [[targetMix]]
    * (rem ≤ budget). Flooring can stall a round (every alloc 0) —
    * stalls are idempotent, so trailing rounds are no-ops and the
    * residual (< Σ active parts) stays undrawn by contract. Strata in
    * the recipe but absent from the corpus drop out of the frame, so
    * their shares redistribute naturally from round 1. Same md5 draw,
    * same [[drawByQuota]] scale shape. */
  def waterfillMix(df: DataFrame, strataCol: String, idCol: String,
      budget: Long, parts: Map[String, Long]): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      s"recipe parts must be positive: $parts")
    parts.values.foreach(p => require(p <= Long.MaxValue / budget,
      s"part $p times budget $budget overflows the long quota arithmetic"))
    val keyed = df.select(col(strataCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      md5(col(idCol).cast("string")).as("pick"))
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = parts.toSeq.toDF("stratum", "part")
    val w = Window.partitionBy(lit(1))
    var q = keyed.groupBy("stratum").agg(count(lit(1)).as("n"))
      .join(broadcast(recipe), "stratum") // inner: unlisted strata drop
      .withColumn("q", lit(0L))
    for (_ <- 1 to WaterfillRounds)
      q = q
        .withColumn("tq", sum(col("q")).over(w))
        .withColumn("ap",
          sum(when(col("q") < col("n"), col("part")).otherwise(0L)).over(w))
        .withColumn("q", least(col("n"), col("q") +
          when(col("q") < col("n") && col("ap") > 0,
            expr(s"((${budget}L - tq) * part) div ap")).otherwise(0L)))
        .select("stratum", "n", "part", "q")
    val quotas = graft.ops.Materialize.barrier(
      q.select(col("stratum"), col("q").as("quota")))
    drawByQuota(keyed, quotas)
  }

  /** The shared quota-application tail of [[temperatureMix]] and
    * [[targetMix]]: bounded-heap rank capped at the LARGEST quota (the
    * rank shuffle moves ≤ maxQuota×P rows per stratum, never the
    * corpus), then a broadcast join applies each stratum's exact quota.
    * The only driver-side value is the max quota — one scalar off the
    * already-materialized quota frame. */
  private def drawByQuota(keyed: DataFrame, quotas: DataFrame): DataFrame = {
    val maxQuota = quotas.agg(max("quota")).head() match {
      case r if r.isNullAt(0) => 0L // empty corpus / empty recipe match
      case r => r.getLong(0)
    }
    if (maxQuota <= 0)
      return keyed.select(col("stratum"), col("doc_id"),
        lit(0L).as("rn")).limit(0)
    require(maxQuota <= Int.MaxValue,
      s"per-stratum quota $maxQuota exceeds the heap-cap envelope")

    heapRank[String](keyed, maxQuota.toInt,
        Ordering.Tuple2[String, Long],
        Seq(col("pick"), col("doc_id")))
      .join(broadcast(quotas), "stratum")
      .filter(col("rn") <= col("quota"))
      .select(col("stratum"), col("doc_id"), col("rn"))
      .orderBy("stratum", "doc_id")
  }

  /** DuckDB oracle for [[temperatureMix]] over `documents`, strata =
    * `lang` (the window form of the same integer-exact quota arithmetic;
    * `//` is DuckDB's floor division ≡ Spark's `div` on positives). */
  def temperatureMixOracleSql(budget: Long): String =
    s"""WITH sizes AS (SELECT lang AS stratum, count(*) AS n
       |              FROM documents GROUP BY 1),
       |w AS (SELECT stratum, n,
       |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * $MixScale) AS BIGINT) AS wt
       |      FROM sizes),
       |q AS (SELECT stratum,
       |        least(n, ($budget * wt) // sum(wt) OVER ()) AS quota FROM w),
       |ranked AS (SELECT lang AS stratum, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |SELECT r.stratum, r.doc_id, r.rn FROM ranked r JOIN q USING (stratum)
       |WHERE r.rn <= q.quota ORDER BY stratum, doc_id""".stripMargin

  /** DuckDB oracle for [[targetMix]] over `documents`, strata = `lang`
    * (same integer quota arithmetic; the recipe rides as a VALUES list). */
  def targetMixOracleSql(budget: Long, parts: Map[String, Long]): String = {
    val partsTotal = parts.values.sum
    // ''-escape embedded quotes (ADVICE r10): targetMix handles ANY
    // stratum string, so the VALUES literal must too, or the oracle
    // silently diverges on (or is injected by) a quoting stratum.
    val values = parts.toSeq.sorted
      .map { case (s, p) => s"('${s.replace("'", "''")}', ${p}::BIGINT)" }
      .mkString(", ")
    s"""WITH sizes AS (SELECT lang AS stratum, count(*) AS n
       |              FROM documents GROUP BY 1),
       |recipe(stratum, part) AS (VALUES $values),
       |q AS (SELECT s.stratum,
       |        least(s.n, ($budget * r.part) // ${partsTotal}) AS quota
       |      FROM sizes s JOIN recipe r ON s.stratum = r.stratum),
       |ranked AS (SELECT lang AS stratum, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |SELECT r.stratum, r.doc_id, r.rn FROM ranked r JOIN q USING (stratum)
       |WHERE r.rn <= q.quota ORDER BY stratum, doc_id""".stripMargin
  }

  /** DuckDB oracle for [[waterfillMix]] over `documents`, strata =
    * `lang` — the SAME [[WaterfillRounds]] integer rounds unrolled as a
    * CTE chain (`q0 … qK`), then the ranked draw. `//` ≡ Spark `div` on
    * the non-negative operands here (rem ≥ 0, parts > 0). */
  def waterfillOracleSql(budget: Long, parts: Map[String, Long]): String = {
    val values = parts.toSeq.sorted
      .map { case (s, p) => s"('${s.replace("'", "''")}', ${p}::BIGINT)" }
      .mkString(", ")
    val rounds = (1 to WaterfillRounds).map { r =>
      s"""q$r AS (SELECT stratum, n, part,
         |  least(n, q + CASE WHEN q < n AND ap > 0
         |    THEN (($budget - tq) * part) // ap ELSE 0 END) AS q
         |  FROM (SELECT stratum, n, part, q, sum(q) OVER () AS tq,
         |          sum(CASE WHEN q < n THEN part ELSE 0 END) OVER () AS ap
         |        FROM q${r - 1}))""".stripMargin
    }.mkString(",\n")
    s"""WITH sizes AS (SELECT lang AS stratum, count(*) AS n
       |              FROM documents GROUP BY 1),
       |recipe(stratum, part) AS (VALUES $values),
       |q0 AS (SELECT s.stratum, s.n, r.part, 0::BIGINT AS q
       |       FROM sizes s JOIN recipe r ON s.stratum = r.stratum),
       |$rounds,
       |ranked AS (SELECT lang AS stratum, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |SELECT r.stratum, r.doc_id, r.rn
       |FROM ranked r JOIN q$WaterfillRounds f USING (stratum)
       |WHERE r.rn <= f.q ORDER BY stratum, doc_id""".stripMargin
  }

  /** DuckDB oracle for [[stratified]] over table `documents`, strata =
    * `lang` (the window form — correct, just not the scale shape). */
  def oracleSql(n: Int): String =
    s"""SELECT lang AS stratum, doc_id, rn FROM (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $n ORDER BY stratum, doc_id""".stripMargin
}
