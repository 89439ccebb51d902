package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** POSITIONAL inverted index + exact phrase search — the index-speed
  * analogue of the reference's substring grep over streamed records
  * (kbrowse `search.clj:74-81` matches value substrings per record;
  * a training-data deployment asks the same "find this exact wording"
  * question — boilerplate hunts, license-string sweeps, eval-prompt
  * leakage — against a corpus too large to re-scan per query). The
  * r19 postings sidecar ([[Bm25.writePostingsIndex]]) is bag-of-words:
  * tf per (term, doc) with positions discarded, so it can rank but
  * never answer adjacency. This sidecar keeps one row per (term,
  * doc_id, pos) occurrence, REFCOUNTED under the additive-landing
  * discipline, so phrase probes read posting-list-sized slices and
  * takedowns stay O(deleted docs).
  *
  * Layout: `{table}` (term, doc_id, pos, c, src) bucketed+sorted by
  * term — a phrase probe's term restriction prunes buckets exactly
  * like the BM25 probe's — and `{table}_meta` (buckets). Landings
  * append c=+1 rows, retirements the same rows negated; readers fold
  * per (term, doc_id, pos) keeping nets > 0 and raise on negatives;
  * compaction restores one row per occurrence. `src` markers are
  * operation-namespaced ([[CorpusWriter.landTag]]).
  *
  * Matching: positions of the phrase's i-th term shift left by i and
  * equi-join on (doc_id, pos) — n−1 joins of term-restricted,
  * fold-slimmed frames for an n-term phrase (phrases are short; every
  * join side is posting-list-sized, and the base frame materializes
  * once). No window functions, no per-doc arrays on the build side —
  * the probe never sees a frame proportional to corpus size.
  */
object PhraseIndex {

  /** One landing's (term, doc_id, pos, c, src) rows. `pos` is the
    * 0-based token ordinal of the lowercased whitespace unigrams; the
    * term restriction of a probe only ever compares pos DIFFERENCES,
    * so the base is a convention, not a contract. The (term, pos)
    * pairing is built array-side and FILTERED before anything explodes
    * when `onlyTerms` is set (the [[Bm25.topK]] rule). */
  private def positionRows(docs: DataFrame, idCol: String,
      textCol: String, src: String, sign: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = graft.functions.GraftFunctions.wordGrams(col(textCol), 1)
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"), posexplode_outer(col("t")).as(Seq("pos", "term")))
      .filter(col("term").isNotNull)
      .select(col("term"), col("doc_id"),
        col("pos").cast("long").as("pos"),
        lit(sign.toLong).as("c"), lit(src).cast("string").as("src"))
  }

  /** Store the corpus's positional index. */
  def writePhraseIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    CorpusWriter.dropOrphanedLocation(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_srcs")
    CorpusWriter.dropOrphanedLocation(spark, s"${table}_meta")
    positionRows(docs, idCol, textCol, src = null, sign = 1)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_meta")
  }

  private def metaBuckets(spark: SparkSession, table: String): Int = {
    val meta = spark.table(s"${table}_meta").collect()
    require(meta.length == 1,
      s"malformed phrase-index meta: ${meta.length} rows")
    meta(0).getAs[Int]("buckets")
  }

  /** Land another doc batch (disjoint-batch contract, mandatory
    * per-batch `src` — a replayed tag is a skipped no-op). */
  def appendToPhraseIndex(docs: DataFrame, idCol: String,
      textCol: String, table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.landTag(src)
    if (CorpusWriter.srcApplied(spark, table, tag)) return
    positionRows(docs, idCol, textCol, tag, sign = 1)
      .write.mode(SaveMode.Append)
      .bucketBy(metaBuckets(spark, table), "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    CorpusWriter.recordSrc(spark, table, tag)
  }

  /** Retire docs: their occurrence rows append NEGATED — O(deleted
    * docs), in force at the read fold from the commit on. */
  def retireFromPhraseIndex(docs: DataFrame, idCol: String,
      textCol: String, table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.retireTag(src)
    if (CorpusWriter.srcApplied(spark, table, tag)) return
    positionRows(docs, idCol, textCol, tag, sign = -1)
      .write.mode(SaveMode.Append)
      .bucketBy(metaBuckets(spark, table), "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    CorpusWriter.recordSrc(spark, table, tag)
  }

  /** Fold to one row per (term, doc_id, pos), dropping zero-net
    * tombstones (raises on over-retirement). Answer-invisible. */
  def compactPhraseIndex(spark: SparkSession, table: String): Unit =
    CorpusWriter.compactAdditiveIndexMulti(spark, table,
      Seq("term", "doc_id", "pos"), "phrase index")

  /** Live (term, doc_id, pos) occurrences of `terms` — the bucketed
    * scan's term restriction pushes into the file listing, and the
    * net-refcount fold is bucket-local (hash partitioning on `term`
    * satisfies the composite grouping). */
  private def livePositions(spark: SparkSession, table: String,
      terms: Seq[String]): DataFrame =
    CorpusWriter.liveAdditiveKeysMulti(
      spark.table(table).filter(col("term").isin(terms: _*)),
      Seq("term", "doc_id", "pos"), "phrase index")

  private def matchCounts(positions: DataFrame,
      phrase: Seq[String]): DataFrame = {
    val qts = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val base = positions.filter(col("term") === qts.head)
      .select(col("doc_id"), col("pos"))
    val starts = qts.zipWithIndex.drop(1).foldLeft(base) {
      case (acc, (t, i)) =>
        acc.join(positions.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    starts.groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
      .orderBy("doc_id")
  }

  /** Exact-phrase occurrence counts per doc from the STORED index —
    * (doc_id, n_occ) for every live doc containing the phrase, ordered
    * by doc_id. No text scan, no tokenization. */
  def occurrencesFromIndex(spark: SparkSession, table: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val qts = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    // Materialized: every phrase position joins against it (n−1
    // consumers), and it is posting-list-sized by the term filter.
    matchCounts(
      Materialize.barrier(livePositions(spark, table, qts.distinct)), qts)
  }

  /** The in-session dual of [[occurrencesFromIndex]]: one text scan,
    * the (term, pos) pairs built and RESTRICTED array-side before the
    * explode. Bit-equal to the stored probe when the index holds
    * exactly the corpus (PhraseIndexSpec pins it). */
  def occurrences(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val qts = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val terms = qts.distinct
    val toks = graft.functions.GraftFunctions.wordGrams(col(textCol), 1)
    val positions = Materialize.barrier(docs.select(
        col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        filter(
          transform(col("t"), (x, i) =>
            struct(x.as("term"), i.cast("long").as("pos"))),
          s => s.getField("term").isin(terms: _*)).as("tp"))
      .filter(size(col("tp")) > 0)
      .select(col("doc_id"), explode(col("tp")).as("tp"))
      .select(col("tp.term").as("term"), col("doc_id"),
        col("tp.pos").as("pos")))
    matchCounts(positions, qts)
  }

  /** PROXIMITY search from the same positional sidecar — the other
    * half of the adjacency family: per doc, the count of (posA, posB)
    * occurrence pairs of two terms within `window` positions
    * (0 < |pa − pb| ≤ window), ordered by doc_id.
    *
    * Scale shape: a doc_id-only equi-join with the range checked after
    * would pay f_a·f_b candidate pairs per doc — quadratic in per-doc
    * term frequency, exactly the blow-up a stopword pair hits at
    * corpus scale. Instead the join is BANDED (the interval-join
    * discipline): positions band at width `window + 1`, term A's rows
    * explode to their own band ±1 (3 slim longs each), and the
    * equi-join runs on (doc_id, band) — |pa − pb| ≤ window forces the
    * bands within ±1, and each true pair meets exactly once (B's band
    * equals exactly one of A's three), so candidate work is bounded by
    * pairs within distance ≤ 2·window + 1 — OUTPUT-linear, never
    * frequency-quadratic. The exact predicate then filters, making the
    * banding answer-invisible (PhraseIndexSpec's cases pin the exact
    * semantics; the oracle never sees the bands). */
  def withinWindowFromIndex(spark: SparkSession, table: String,
      termA: String, termB: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val (a, b) = (termA.toLowerCase(java.util.Locale.ROOT), termB.toLowerCase(java.util.Locale.ROOT))
    val live = Materialize.barrier(
      livePositions(spark, table, Seq(a, b).distinct))
    val w1 = (window + 1).toLong
    val pa = live.filter(col("term") === a)
      .select(col("doc_id"), col("pos").as("pa"),
        (col("pos") / lit(w1)).cast("long").as("__b0"))
      .withColumn("band", explode(array(
        col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val pb = live.filter(col("term") === b)
      .select(col("doc_id"), col("pos").as("pb"),
        (col("pos") / lit(w1)).cast("long").as("band"))
    pa.join(pb, Seq("doc_id", "band"))
      .filter(abs(col("pa") - col("pb")) <= window &&
        col("pa") =!= col("pb"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_pairs"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[withinWindowFromIndex]] over `documents`. */
  def windowOracleSql(termA: String, termB: String, window: Int,
      corpusSql: String = "documents"): String = {
    def esc(t: String) = t.replace("'", "''").toLowerCase(java.util.Locale.ROOT)
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM $corpusSql),
       |pos AS (
       |  SELECT doc_id, unnest(t) AS term,
       |         CAST(generate_subscripts(t, 1) AS BIGINT) AS pos
       |  FROM toks),
       |m AS (
       |  SELECT a.doc_id FROM pos a
       |  JOIN pos b ON b.doc_id = a.doc_id
       |    AND abs(a.pos - b.pos) <= $window AND a.pos <> b.pos
       |    AND b.term = '${esc(termB)}'
       |  WHERE a.term = '${esc(termA)}')
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle over table `documents`: the same tokenization as
    * q89's oracle, positions via generate_subscripts (base cancels in
    * the join offsets), one CTE per phrase position. */
  def oracleSql(phrase: Seq[String], corpusSql: String = "documents"): String = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val qts = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    def esc(t: String) = t.replace("'", "''")
    val joins = qts.zipWithIndex.drop(1).map { case (t, i) =>
      s"JOIN pos p$i ON p$i.doc_id = p0.doc_id AND p$i.pos = p0.pos + $i\n" +
        s"    AND p$i.term = '${esc(t)}'"
    }.mkString("\n  ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM $corpusSql),
       |pos AS (
       |  SELECT doc_id, unnest(t) AS term,
       |         CAST(generate_subscripts(t, 1) AS BIGINT) AS pos
       |  FROM toks),
       |m AS (
       |  SELECT p0.doc_id FROM pos p0
       |  ${joins}
       |  WHERE p0.term = '${esc(qts.head)}')
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
