package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Increment novelty against the standing corpus — "how much of this
  * crawl is NEW content?": per increment document, the fraction of its
  * distinct word n-grams that appear nowhere in the standing corpus.
  * The curation signal behind crawl-budget decisions (a source whose
  * batches stop bringing novel grams is mined out) and the admission
  * complement of the dedup family: q56/q65 ask "is this document a
  * copy?", novelty asks "how much of it is new text at all?".
  *
  * This is deliberately the NON-broadcast contamination grain.
  * [[Decontam.overlapFraction]] (q84) probes a broadcast eval-gram set
  * under an explicit size contract — eval suites are small. Here the
  * reference side IS the corpus: its distinct-gram frame is unbounded,
  * so the probe is a gram-fingerprint-keyed equi-join (shuffle or
  * bucket-local; AQE may still broadcast a small increment), and at
  * deployment the corpus side is a STORED bucketed sidecar
  * ([[graft.pipeline.CorpusWriter.writeGramIndex]], the q56/q67
  * convention) so the recurring cost is increment-sized + one bucketed
  * index scan with NO corpus re-tokenize.
  *
  * Scale shape: both sides tokenize map-side through the native 63-bit
  * gram fingerprinter; per-side dedup is a map-side-combined distinct;
  * the only corpus-scale exchange is the gram join itself (absent in
  * the stored form — the index is bucketed by `gram_fp`). Per-doc
  * rollup rows are bounded by document gram counts.
  */
object Novelty {

  /** (doc_id, n_grams, novel_grams, novelty_frac) per increment doc
    * with ≥1 n-gram: distinct grams absent from the non-increment
    * corpus, exact integers until one final IEEE division. */
  def noveltyReport(docs: DataFrame, idCol: String, textCol: String,
      incrementPred: org.apache.spark.sql.Column, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val gramHashes =
      graft.functions.GraftFunctions.wordGramHashes(col(textCol), n)
    val corpusGrams = docs.filter(!incrementPred)
      .select(explode_outer(gramHashes).as("gram_fp"))
      .filter(col("gram_fp").isNotNull)
      .distinct()
    scoreAgainst(docs.filter(incrementPred), idCol, textCol, n, corpusGrams)
  }

  /** [[noveltyReport]] against a STORED corpus gram index
    * (`CorpusWriter.writeGramIndex` — refcounted, bucketed by
    * `gram_fp`): the steady-state deployment form; the corpus
    * contributes one bucketed index scan folded to its live fingerprint
    * set ([[CorpusWriter.readGramIndex]] — bucket-local, so neither the
    * fold nor the join needs a corpus-side exchange), no re-tokenize.
    * Subtract-landed deletes are in force here the moment they commit
    * (fingerprints netting ≤ 0 fold away). */
  def noveltyAgainstIndex(spark: SparkSession, table: String,
      increment: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame = {
    val meta = spark.table(s"${table}_meta").collect()
    require(meta.length == 1 && meta(0).getAs[Int]("n") == n,
      s"gram index $table was written under " +
        s"n=${meta.map(_.getAs[Int]("n")).mkString(",")}, " +
        s"query posed under n=$n")
    scoreAgainst(increment, idCol, textCol, n,
      graft.pipeline.CorpusWriter.readGramIndex(spark, table))
  }

  private def scoreAgainst(increment: DataFrame, idCol: String,
      textCol: String, n: Int, corpusGrams: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(increment.sparkSession)
    val gramHashes =
      graft.functions.GraftFunctions.wordGramHashes(col(textCol), n)
    increment
      .select(col(idCol).cast("long").as("doc_id"),
        explode_outer(gramHashes).as("gram_fp"))
      .filter(col("gram_fp").isNotNull)
      .distinct()
      .join(corpusGrams.withColumn("__seen", lit(1L)), Seq("gram_fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(when(col("__seen").isNull, 1L)), lit(0L))
          .as("novel_grams"))
      .select(col("doc_id"), col("n_grams"), col("novel_grams"),
        (col("novel_grams").cast("double") / col("n_grams").cast("double"))
          .as("novelty_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[noveltyReport]] over table `documents`:
    * `incrementPredSql` must render the same predicate. */
  def oracleSql(incrementPredSql: String, n: Int): String =
    oracleSql(incrementPredSql, s"NOT ($incrementPredSql)", n)

  /** [[oracleSql]] with an INDEPENDENT reference predicate — the
    * retirement gate's shape (q172): after
    * [[CorpusWriter.retireFromGramIndex]] the reference set is the
    * remaining index corpus, which is no longer the increment's
    * complement. */
  def oracleSql(incrementPredSql: String, referencePredSql: String,
      n: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t,
       |         ($incrementPredSql) AS is_inc,
       |         ($referencePredSql) AS is_ref
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, is_inc, is_ref,
       |    ${graft.oracle.Duck.gramHash63Sql("gram")} AS gram_fp
       |  FROM (
       |    SELECT doc_id, is_inc, is_ref,
       |      unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |        i -> array_to_string(t[i:i+${n - 1}], ' '))) AS gram
       |    FROM toks)),
       |corpus_grams AS (SELECT DISTINCT gram_fp FROM grams WHERE is_ref),
       |dg AS (SELECT DISTINCT doc_id, gram_fp FROM grams WHERE is_inc),
       |cnt AS (
       |  SELECT dg.doc_id,
       |    CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(coalesce(sum(CASE WHEN c.gram_fp IS NULL THEN 1 END), 0)
       |      AS BIGINT) AS novel_grams
       |  FROM dg LEFT JOIN corpus_grams c USING (gram_fp)
       |  GROUP BY dg.doc_id)
       |SELECT doc_id, n_grams, novel_grams,
       |  CAST(novel_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
       |    AS novelty_frac
       |FROM cnt ORDER BY doc_id""".stripMargin
}
