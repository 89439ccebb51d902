package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** BM25 keyword retrieval over the corpus — the lexical search seat of a
  * training-data pipeline (eval-set leakage hunts by keyword, targeted
  * corpus slicing, retrieval-augmented labeling all start with "give me
  * the top documents for these terms"). Okapi BM25 with the standard
  * saturation shape, k1/b parameterized.
  *
  * The idf factor is the RATIONAL variant `(N − df + 0.5) / (df + 0.5)`
  * — the quantity the classic formulation takes `ln` of — for the
  * [[TfIdf]] reason: transcendentals are not bit-reproducible across
  * engines, and the ratio preserves the rarity ordering the log only
  * compresses (documented divergence from the textbook constant, same
  * rule as q51). Per-term scores are then lifted to 2^20 fixed-point
  * integers ([[BigramModel]]'s rule: per-doc float sums are not
  * order-stable across partitions; integer sums are), summed exactly,
  * and divided once for the reported double.
  *
  * Scale shape: ONE text scan total (PlanAuditSpec-pinned) — the scan
  * emits per doc its token count plus ONLY its query-term occurrences
  * (an array-side filter before anything explodes), and that slim
  * (long, long, tiny-array) frame is MATERIALIZED because the length
  * stats and the match aggregate both consume it. So the (doc, term)
  * frame is posting-list-sized (docs containing a query term), never
  * corpus-vocabulary-sized, and no branch re-reads text. The |Q|-row
  * df table and the 1-row stats frame broadcast; the posting join is
  * doc-keyed and AQE-sized; top-k is `orderBy.limit` —
  * TakeOrderedAndProject's bounded per-partition heaps, never a full
  * sort. Text never reshuffles.
  */
object Bm25 {

  /** Fixed-point scale for per-term BM25 contributions. */
  val Scale: Long = 1L << 20

  /** Top-`k` documents for `terms` (lowercased whitespace unigrams) by
    * BM25 with rational idf: (doc_id, n_hits, score_fp, score), ordered
    * by (score_fp DESC, doc_id) — deterministic under ties. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0, s"need terms and k > 0: $terms, $k")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val qts = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val toks = graft.functions.GraftFunctions.wordGrams(col(textCol), 1)
    // ONE text scan: per doc, the token count plus only the query-term
    // occurrences (an array-side filter — the posting restriction lands
    // before anything explodes). Materialized because lengths/stats and
    // the match aggregate both consume it; the cached frame is
    // (long, long, tiny array) per doc — corpus-count rows, never text.
    val base = Materialize.barrier(docs.select(
        col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        filter(col("t"), x => x.isin(qts: _*)).as("qt"))
      .filter(col("dl") > 0))
    val lens = base.select("doc_id", "dl")
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val matches = base
      .select(col("doc_id"), explode(col("qt")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = matches.groupBy("term").agg(count(lit(1)).as("df"))
    matches
      .join(broadcast(dfT), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        // idf_r = (N - df + 0.5) / (df + 0.5); sat = tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))
        floor((((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))) *
          lit(Scale.toDouble)).cast("long").as("s_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), sum("s_fp").as("score_fp"))
      .select(col("doc_id"), col("n_hits"), col("score_fp"),
        (col("score_fp").cast("double") / lit(Scale.toDouble)).as("score"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** Self-retrieval MRR@k — the tuning meter of the lexical-retrieval
    * family (the q87 convention applied to BM25): every `mod`-selected
    * document poses its own first `nTerms` tokens as a query, and the
    * report is the rank at which BM25 retrieves the source document
    * back (0 = missed the top-k), with the reciprocal rank in 2^20
    * fixed point — `Scale DIV rank`, exact integers, no IEEE surface
    * beyond the q89-proven per-term score.
    *
    * This is the BATCH multi-query form q89's single-query shape
    * doesn't cover: ONE text scan restricted to the UNION of all query
    * terms, per-(query, doc) scores via broadcast joins of the
    * (qid, term) frame (bounded: ≤ maxQueries·nTerms rows), and the
    * per-query top-k through the [[Sampling.heapRank]] map-side
    * bounded heaps — never a per-query corpus window (a qid-partitioned
    * window would funnel posting-list-sized frames through ≤ maxQueries
    * tasks). The query set itself is a bounded driver collect
    * (≤ maxQueries rows, the q102 argmax convention). */
  def selfRetrievalMrr(docs: DataFrame, idCol: String, textCol: String,
      mod: Long = 997L, maxQueries: Int = 8, nTerms: Int = 5, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val toks = graft.functions.GraftFunctions.wordGrams(col(textCol), 1)
    val qRows = docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id"), slice(col("t"), 1, nTerms).as("qt"))
      .orderBy("doc_id").limit(maxQueries)
      .as[(Long, Seq[String])].collect()
    require(qRows.nonEmpty, s"no query documents under doc_id % $mod == 0")
    val qterm = qRows.toSeq.flatMap { case (qid, ts) =>
      ts.distinct.map(qid -> _)
    }
    val termSet = qterm.map(_._2).distinct

    val base = Materialize.barrier(docs.select(
        col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        filter(col("t"), x => x.isin(termSet: _*)).as("qt"))
      .filter(col("dl") > 0))
    val lens = base.select("doc_id", "dl")
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val matches = base
      .select(col("doc_id"), explode(col("qt")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = matches.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = matches
      .join(broadcast(dfT), "term")
      .join(broadcast(qterm.toDF("qid", "term")), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        // byte-identical op sequence to topK/q89's oracle
        floor((((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))) *
          lit(Scale.toDouble)).cast("long").as("s_fp"))
      .groupBy("qid", "doc_id").agg(sum("s_fp").as("score_fp"))
    val keyed = scored.select(col("qid").cast("string").as("stratum"),
      col("doc_id"), col("score_fp"))
    // Worst = lowest score, tie-break LARGER doc_id (the heap evicts its
    // max), consistent with the (score DESC, doc_id ASC) rank order.
    val worstFirst: Ordering[(Long, Long)] =
      Ordering.by { case (s, id) => (-s, id) }
    val ranked = Sampling.heapRank[Long](keyed, k, worstFirst,
      Seq(col("score_fp").desc, col("doc_id").asc))
    val self = ranked
      .filter(col("stratum") === col("doc_id").cast("string"))
      .select(col("doc_id").as("query_id"), col("rn"))
    qRows.map(_._1).toSeq.toDF("query_id")
      .join(self, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("rn"), lit(0L)).as("rank"),
        coalesce(expr(s"$Scale DIV rn"), lit(0L)).as("rr_fp"))
      .orderBy("query_id")
  }

  /** DuckDB oracle for [[selfRetrievalMrr]] over table `documents`: the
    * same query derivation, the q89 per-term score verbatim, and the
    * per-query rank as a window over the (qid, doc) aggregate. */
  def mrrOracleSql(mod: Long = 997L, maxQueries: Int = 8, nTerms: Int = 5,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |lens AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
       |  WHERE len(t) > 0),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE)
       |           / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM lens),
       |qd AS (
       |  SELECT doc_id AS qid, t[1:$nTerms] AS qts FROM toks
       |  WHERE len(t) > 0 AND doc_id % $mod = 0
       |  ORDER BY doc_id LIMIT $maxQueries),
       |qterm AS (SELECT DISTINCT qid, unnest(qts) AS term FROM qd),
       |matches AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
       |  WHERE term IN (SELECT term FROM qterm)
       |  GROUP BY doc_id, term),
       |df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |         FROM matches GROUP BY term),
       |scored AS (
       |  SELECT q.qid, m.doc_id,
       |    CAST(floor(((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
       |                 / (CAST(d.df AS DOUBLE) + 0.5))
       |      * ((CAST(m.tf AS DOUBLE) * ${k1 + 1.0})
       |         / (CAST(m.tf AS DOUBLE) + $k1
       |            * (${1.0 - b} + $b * CAST(l.dl AS DOUBLE) / s.avgdl)))
       |      * ${Scale}.0) AS BIGINT) AS s_fp
       |  FROM matches m
       |  JOIN df_t d USING (term)
       |  JOIN qterm q USING (term)
       |  JOIN lens l ON m.doc_id = l.doc_id
       |  CROSS JOIN stats s),
       |agg AS (
       |  SELECT qid, doc_id, CAST(sum(s_fp) AS BIGINT) AS score_fp
       |  FROM scored GROUP BY qid, doc_id),
       |ranked AS (
       |  SELECT qid, doc_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY score_fp DESC, doc_id)
       |      AS rnk
       |  FROM agg),
       |self AS (
       |  SELECT qid, max(CASE WHEN doc_id = qid AND rnk <= $k THEN rnk END)
       |    AS r
       |  FROM ranked GROUP BY qid)
       |SELECT q.qid AS query_id,
       |  CAST(coalesce(s.r, 0) AS BIGINT) AS rank,
       |  CAST(coalesce($Scale // s.r, 0) AS BIGINT) AS rr_fp
       |FROM (SELECT qid FROM qd) q LEFT JOIN self s USING (qid)
       |ORDER BY query_id""".stripMargin

  // ------------------------------------------------------ stored index
  // The INVERTED-INDEX sidecar (r19): q89/q127 recompute postings per
  // query — one text scan each time — where a lexical-search deployment
  // persists them once and probes them forever. Three refcounted
  // tables, all subtract-landable (the additive discipline):
  //  - `{table}`       (term, doc_id, tf, src)  bucketed+sorted by term
  //  - `{table}_lens`  (doc_id, dl, src)        bucketed+sorted by doc_id
  //  - `{table}_stats` (n_docs, dl_sum, src)    one slim row per landing
  // A landing appends its docs' postings/lengths/stats; a retirement
  // appends them NEGATED (O(deleted docs) — no index rewrite); readers
  // fold per key keeping nets > 0 and raise on negatives; compaction
  // restores one row per key. Each of the three appends is individually
  // src-guarded, so a crash between them retries idempotently (the
  // single-table "landing is its own marker" trick, applied per table).

  private def indexTables(table: String): Seq[String] =
    Seq(table, s"${table}_lens", s"${table}_stats")

  /** One landing's (postings, lens, stats) frames — `sign` = -1 for a
    * retirement. Docs with zero tokens drop (the [[topK]] rule, so the
    * stored stats equal the in-session ones). One tokenize scan total:
    * lens and stats DERIVE from the postings aggregate (dl = Σ tf per
    * doc, exactly), so the materialized frame is the slim (term,
    * doc_id, tf) postings — what gets written anyway — never the raw
    * token arrays. */
  private def landingFrames(docs: DataFrame, idCol: String,
      textCol: String, src: String, sign: Int): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = graft.functions.GraftFunctions.wordGrams(col(textCol), 1)
    val posAgg = Materialize.barrier(docs.select(
        col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode_outer(col("t")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf")))
    val lenAgg = posAgg.groupBy("doc_id").agg(sum("tf").as("dl"))
    val postings = posAgg
      .select(col("term"), col("doc_id"),
        (col("tf") * lit(sign.toLong)).as("tf"),
        lit(src).cast("string").as("src"))
    val lens = lenAgg.select(col("doc_id"),
      (col("dl") * lit(sign.toLong)).as("dl"),
      lit(src).cast("string").as("src"))
    val stats = lenAgg.agg(
        (count(lit(1)) * lit(sign.toLong)).as("n_docs"),
        (sum("dl") * lit(sign.toLong)).as("dl_sum"))
      .select(col("n_docs"), col("dl_sum"), lit(src).cast("string").as("src"))
    (postings, lens, stats)
  }

  /** Commit one landing's three sub-table appends, each individually
    * src-guarded. The three commits are NOT one transaction, so a
    * concurrent probe can read the tables at different landing
    * boundaries — the inconsistency window is made BOUNDED and
    * one-sided by ordering: on an APPEND stats commit LAST (postings →
    * lens → stats), on a RETIRE stats commit FIRST (stats → lens →
    * postings). Either way the invariant a mid-landing probe sees is
    * "stats count AT MOST the docs whose postings are present" — n_docs
    * and dl_sum never include phantom docs, so the transient idf/avgdl
    * error is one lagging landing's worth in the conservative
    * direction (rarity slightly overstated for the in-flight docs),
    * never scores for docs the stats deny exist. Probes that need
    * exact landing-boundary reads should quiesce landings (the
    * [[graft.streaming.StreamLanding]] deployment runs probe batches
    * between foreachBatch commits, which serializes them). */
  private def appendFrames(spark: org.apache.spark.sql.SparkSession,
      table: String, buckets: Int,
      frames: (DataFrame, DataFrame, DataFrame), src: String,
      statsFirst: Boolean): Unit = {
    val (postings, lens, stats) = frames
    def commitPostings(): Unit =
      if (!CorpusWriter.srcApplied(spark, table, src)) {
        postings.write.mode(org.apache.spark.sql.SaveMode.Append)
          .bucketBy(buckets, "term").sortBy("term")
          .format("parquet").saveAsTable(table)
        CorpusWriter.recordSrc(spark, table, src)
      }
    def commitLens(): Unit =
      if (!CorpusWriter.srcApplied(spark, s"${table}_lens", src)) {
        lens.write.mode(org.apache.spark.sql.SaveMode.Append)
          .bucketBy(buckets, "doc_id").sortBy("doc_id")
          .format("parquet").saveAsTable(s"${table}_lens")
        CorpusWriter.recordSrc(spark, s"${table}_lens", src)
      }
    def commitStats(): Unit =
      if (!CorpusWriter.srcApplied(spark, s"${table}_stats", src)) {
        stats.write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet").saveAsTable(s"${table}_stats")
        CorpusWriter.recordSrc(spark, s"${table}_stats", src)
      }
    if (statsFirst) { commitStats(); commitLens(); commitPostings() }
    else { commitPostings(); commitLens(); commitStats() }
  }

  /** Store the corpus's inverted index. */
  def writePostingsIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    indexTables(table).foreach { t =>
      CorpusWriter.dropOrphanedLocation(spark, t)
      spark.sql(s"DROP TABLE IF EXISTS ${t}_srcs") // stale landing history
    }
    CorpusWriter.dropOrphanedLocation(spark, s"${table}_meta")
    // Initial rows carry a NULL src like every other write* sidecar —
    // parquet footers see an all-null column (srcApplied's pruning
    // rationale), and no tag is reserved: appendToPostingsIndex /
    // retireFromPostingsIndex accept any tag a landing chooses.
    val (postings, lens, stats) =
      landingFrames(docs, idCol, textCol, src = null, sign = 1)
    postings.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    lens.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${table}_lens")
    stats.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_stats")
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_meta")
  }

  private def metaBuckets(spark: org.apache.spark.sql.SparkSession,
      table: String): Int = {
    val meta = spark.table(s"${table}_meta").collect()
    require(meta.length == 1,
      s"malformed postings-index meta: ${meta.length} rows")
    meta(0).getAs[Int]("buckets")
  }

  /** Land another doc batch (disjoint-batch contract; `src` is the
    * mandatory per-batch tag — a re-submitted tag is a skipped no-op,
    * per table, so a crash mid-landing retries to completion). */
  def appendToPostingsIndex(docs: DataFrame, idCol: String,
      textCol: String, table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.landTag(src)
    // Early-out before the (eager) tokenize aggregate: a fully-applied
    // replay must not pay the landing's compute to learn it's a no-op.
    if (indexTables(table).forall(CorpusWriter.srcApplied(spark, _, tag)))
      return
    appendFrames(spark, table, metaBuckets(spark, table),
      landingFrames(docs, idCol, textCol, tag, sign = 1), tag,
      statsFirst = false)
  }

  /** Retire docs: a SUBTRACT landing of their postings, lengths, and
    * stats — O(deleted docs), in force at the read folds from the
    * commit on. */
  def retireFromPostingsIndex(docs: DataFrame, idCol: String,
      textCol: String, table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.retireTag(src)
    if (indexTables(table).forall(CorpusWriter.srcApplied(spark, _, tag)))
      return
    appendFrames(spark, table, metaBuckets(spark, table),
      landingFrames(docs, idCol, textCol, tag, sign = -1), tag,
      statsFirst = true)
  }

  private def guarded(c: org.apache.spark.sql.Column, keySql: String,
      what: String): org.apache.spark.sql.Column =
    when(c < 0, expr(
      s"CAST(raise_error(CONCAT('$what retirement drove ', $keySql, " +
        "' below zero')) AS BIGINT)")).otherwise(c)

  /** Live postings (term, doc_id, tf): per-key net, nets > 0 kept,
    * negatives raise. Optionally term-restricted BEFORE the fold (the
    * probe path — the filter pushes into the bucketed scan). */
  private[pipeline] def livePostings(spark: org.apache.spark.sql.SparkSession,
      table: String, terms: Option[Seq[String]] = None): DataFrame = {
    val t = spark.table(table)
    val scoped = terms.map(ts => t.filter(col("term").isin(ts: _*))).getOrElse(t)
    scoped.groupBy("term", "doc_id").agg(sum("tf").as("tf"))
      .withColumn("tf",
        guarded(col("tf"), "term, ' ', CAST(doc_id AS STRING)", "postings"))
      .filter(col("tf") > 0)
  }

  /** Live doc lengths (doc_id, dl). Optionally doc-restricted BEFORE
    * the fold (the probe path): the semi-join key IS the fold key, so
    * restricting raw rows first nets each surviving doc_id identically
    * — and the fold then does posting-list-sized work instead of
    * corpus-doc-count work per probe (the r19 verdict's one weak
    * spot). The candidate side is posting-list-sized — which is small
    * for selective terms but CORPUS-DOC-COUNT-sized for a stopword
    * query, so the join strategy is deliberately left to the planner
    * (AQE broadcasts the small case; a forced broadcast() here would
    * hit the 8 GB broadcast wall / driver OOM exactly when a
    * high-df term makes the candidate set huge). The lens table is
    * doc_id-bucketed, so the fold stays exchange-free either way. */
  private[pipeline] def liveLens(spark: org.apache.spark.sql.SparkSession,
      table: String, docIds: Option[DataFrame] = None): DataFrame = {
    val t = spark.table(s"${table}_lens")
    val scoped = docIds
      .map(d => t.join(d.select("doc_id"), Seq("doc_id"), "left_semi"))
      .getOrElse(t)
    scoped.groupBy("doc_id").agg(sum("dl").as("dl"))
      .withColumn("dl",
        guarded(col("dl"), "CAST(doc_id AS STRING)", "doc lengths"))
      .filter(col("dl") > 0)
  }

  /** The netted live-doc count — N for stored-index consumers that
    * weight by rarity ([[TfIdf.topTermsFromIndex]]). */
  private[pipeline] def liveDocCount(spark: org.apache.spark.sql.SparkSession,
      table: String): Long = liveStats(spark, table)._1

  /** Net corpus stats from the O(landings) stats rows. */
  private def liveStats(spark: org.apache.spark.sql.SparkSession,
      table: String): (Long, Double) = {
    val r = spark.table(s"${table}_stats")
      .agg(sum("n_docs").as("n"), sum("dl_sum").as("s")).collect()(0)
    val n = r.getLong(0)
    require(n > 0, s"postings index $table has no live docs (n_docs=$n)")
    // The same IEEE division topK's stats frame performs.
    (n, r.getLong(1).toDouble / n.toDouble)
  }

  /** Fold the three tables to one row per key, dropping zero-net
    * tombstones (raises on over-retirement; srcs survive in each
    * table's `_srcs`). Answer-invisible. */
  def compactPostingsIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    // Record any live tags the per-landing recordSrc missed (the crash
    // window between a landing and its record) BEFORE the folds erase
    // them — a replay across this compaction must still be recognized.
    indexTables(table).foreach { t =>
      CorpusWriter.recordSrcs(spark, t)
      CorpusWriter.compactSrcs(spark, t)
    }
    CorpusWriter.rewriteBucketed(spark, table) { df =>
      df.groupBy("term", "doc_id").agg(sum("tf").as("tf"))
        .withColumn("tf",
          guarded(col("tf"), "term, ' ', CAST(doc_id AS STRING)", "postings"))
        .filter(col("tf") > 0)
        .select(col("term"), col("doc_id"), col("tf"),
          lit(null).cast("string").as("src"))
    }
    CorpusWriter.rewriteBucketed(spark, s"${table}_lens") { df =>
      df.groupBy("doc_id").agg(sum("dl").as("dl"))
        .withColumn("dl",
          guarded(col("dl"), "CAST(doc_id AS STRING)", "doc lengths"))
        .filter(col("dl") > 0)
        .select(col("doc_id"), col("dl"), lit(null).cast("string").as("src"))
    }
    // Stats fold to one row (plain table, slim by construction).
    val swap = s"${table}_stats__compact"
    CorpusWriter.dropOrphanedLocation(spark, swap)
    spark.table(s"${table}_stats")
      .agg(sum("n_docs").as("n_docs"), sum("dl_sum").as("dl_sum"))
      .select(col("n_docs"), col("dl_sum"),
        lit(null).cast("string").as("src"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(swap)
    spark.sql(s"DROP TABLE ${table}_stats")
    spark.sql(s"ALTER TABLE $swap RENAME TO ${table}_stats")
  }

  /** [[selfRetrievalMrr]] against the STORED index — the index-QUALITY
    * meter of the lexical family (the q175 staleness-meter analogue):
    * queries still derive from corpus text (a bounded ≤ maxQueries
    * collect — the probe side owns its text), but every score reads
    * the term-restricted postings fold, the lens fold, and the netted
    * stats — so after landings and takedowns this number says whether
    * the SERVED index still retrieves what it should, without
    * re-tokenizing the corpus. Bit-equal to [[selfRetrievalMrr]] when
    * the index holds exactly the corpus (q190's oracle is q114's). */
  def selfRetrievalMrrFromIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, docs: DataFrame, idCol: String, textCol: String,
      mod: Long = 997L, maxQueries: Int = 8, nTerms: Int = 5, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val toks = graft.functions.GraftFunctions.wordGrams(col(textCol), 1)
    val qRows = docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id"), slice(col("t"), 1, nTerms).as("qt"))
      .orderBy("doc_id").limit(maxQueries)
      .as[(Long, Seq[String])].collect()
    require(qRows.nonEmpty, s"no query documents under doc_id % $mod == 0")
    val qterm = qRows.toSeq.flatMap { case (qid, ts) =>
      ts.distinct.map(qid -> _)
    }
    val termSet = qterm.map(_._2).distinct
    val posts = Materialize.barrier(livePostings(spark, table, Some(termSet)))
    val dfT = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val lens = liveLens(spark, table, Some(posts.select("doc_id").distinct()))
    val (nDocs, avgdl) = liveStats(spark, table)
    val scored = posts
      .join(broadcast(dfT), "term")
      .join(broadcast(qterm.toDF("qid", "term")), "term")
      .join(lens, "doc_id")
      .select(col("qid"), col("doc_id"),
        // byte-identical op sequence to topK/selfRetrievalMrr's oracle
        floor((((lit(nDocs) - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))) *
          lit(Scale.toDouble)).cast("long").as("s_fp"))
      .groupBy("qid", "doc_id").agg(sum("s_fp").as("score_fp"))
    val keyed = scored.select(col("qid").cast("string").as("stratum"),
      col("doc_id"), col("score_fp"))
    val worstFirst: Ordering[(Long, Long)] =
      Ordering.by { case (sc, id) => (-sc, id) }
    val ranked = Sampling.heapRank[Long](keyed, k, worstFirst,
      Seq(col("score_fp").desc, col("doc_id").asc))
    val self = ranked
      .filter(col("stratum") === col("doc_id").cast("string"))
      .select(col("doc_id").as("query_id"), col("rn"))
    qRows.map(_._1).toSeq.toDF("query_id")
      .join(self, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("rn"), lit(0L)).as("rank"),
        coalesce(expr(s"$Scale DIV rn"), lit(0L)).as("rr_fp"))
      .orderBy("query_id")
  }

  /** BM25 top-`k` against the STORED index — the deployment form of
    * [[topK]]: no text scan, no tokenization; the probe reads the
    * bucketed postings restricted to the |Q| query terms (filter pushed
    * into the scan), folds per (term, doc) net tf, joins the lens fold
    * RESTRICTED to the candidate docs before it folds ([[liveLens]]'s
    * pushdown — every stage is posting-list-sized, nothing is linear in
    * corpus doc count), and reuses [[topK]]'s exact per-term IEEE op
    * sequence with the corpus stats as driver literals (the same
    * division) — bit-equal to [[topK]] over the landed corpus
    * (Bm25IndexSpec + q186 pin it). */
  def topKFromIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0, s"need terms and k > 0: $terms, $k")
    val qts = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    // Posting-list-sized by the term restriction; materialized because
    // the df derivation, the score join, and the lens semi-join all
    // consume it — one bucketed scan, not three.
    val posts = Materialize.barrier(livePostings(spark, table, Some(qts)))
    val dfT = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val lens = liveLens(spark, table, Some(posts.select("doc_id").distinct()))
    val (nDocs, avgdl) = liveStats(spark, table)
    posts
      .join(broadcast(dfT), "term")
      .join(lens, "doc_id")
      .select(col("doc_id"),
        floor((((lit(nDocs) - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))) *
          lit(Scale.toDouble)).cast("long").as("s_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), sum("s_fp").as("score_fp"))
      .select(col("doc_id"), col("n_hits"), col("score_fp"),
        (col("score_fp").cast("double") / lit(Scale.toDouble)).as("score"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[topK]] over table `documents` — the same IEEE
    * op sequence per term (idf ratio, saturation, 2^20 lift, floor),
    * integer sums cast back from HUGEINT. */
  def oracleSql(terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, corpusSql: String = "documents"): String = {
    val termList = terms.map(t => s"'${t.toLowerCase(java.util.Locale.ROOT)}'").mkString(", ")
    s"""WITH lens AS (
       |  SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT) AS dl
       |  FROM $corpusSql
       |  WHERE len(regexp_extract_all(lower(text), '\\S+')) > 0),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE)
       |           / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM lens),
       |matches AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id,
       |          unnest(regexp_extract_all(lower(text), '\\S+')) AS term
       |        FROM $corpusSql)
       |  WHERE term IN ($termList)
       |  GROUP BY doc_id, term),
       |df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |         FROM matches GROUP BY term),
       |scored AS (
       |  SELECT m.doc_id,
       |    CAST(floor(((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
       |                 / (CAST(d.df AS DOUBLE) + 0.5))
       |      * ((CAST(m.tf AS DOUBLE) * ${k1 + 1.0})
       |         / (CAST(m.tf AS DOUBLE) + $k1
       |            * (${1.0 - b} + $b * CAST(l.dl AS DOUBLE) / s.avgdl)))
       |      * ${Scale}.0) AS BIGINT) AS s_fp
       |  FROM matches m
       |  JOIN df_t d USING (term)
       |  JOIN lens l ON m.doc_id = l.doc_id
       |  CROSS JOIN stats s)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       |       CAST(sum(s_fp) AS BIGINT) AS score_fp,
       |       CAST(CAST(sum(s_fp) AS BIGINT) AS DOUBLE) / ${Scale}.0 AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score_fp DESC, doc_id LIMIT $k""".stripMargin
  }
}
