package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalization-robust exact dedup (round 15).
  *
  * Web-crawl corpora carry trivially re-encoded copies of one document —
  * case changes, punctuation/quoting variants, re-wrapped whitespace —
  * that exact dedup (q20) misses and near-dup detectors spend banding
  * budget on. The standard pipeline move (Gopher/C4 lineage) is an
  * aggressive canonical form FOR MATCHING ONLY (the kept document is the
  * original text): lowercase, every non-alphanumeric run → one space,
  * trim. Two docs collapse iff their canonical forms are byte-equal.
  *
  * Scale shape: the canonical form is per-row codegen'd string work
  * (lower + one regexp pass); the dedup groups on md5(canonical) — a
  * SLIM 32-hex-char shuffle key regardless of document size, never the
  * document text (the reference's exact-dedup convention at corpus
  * scale; 128 bits ⇒ collision-free in any real corpus). One exchange,
  * map-side partial agg, keep = min(id) per canonical class.
  */
object Normalize {

  /** The canonical matching form: lowercase, non-alphanumeric runs →
    * one space, trimmed. ASCII-conservative by design — multibyte
    * letters normalize to separators, which overcollapses exotic pairs
    * rather than undercollapsing (the safe direction for a dedup KEY;
    * language-aware folding belongs to a tokenizer, not a dedup key). */
  def canonical(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** DuckDB rendering of [[canonical]] — DuckDB's regexp_replace
    * replaces the FIRST match unless the 'g' option is passed. */
  def canonicalSql(col: String): String =
    s"trim(regexp_replace(lower($col), '[^a-z0-9]+', ' ', 'g'))"

  /** One row per surviving document: `(doc_id, n_collapsed)` — the
    * minimum-id member of each canonical class and how many raw docs
    * the class held. Joined back semi-style via the slim keeper frame,
    * so full rows never shuffle. */
  def dedupNormalized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val classes = docs
      .select(col(idCol).cast("long").as("doc_id"),
        md5(canonical(col(textCol))).as("ckey"))
      .groupBy("ckey")
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_collapsed"))
    classes.select(col("doc_id"), col("n_collapsed")).orderBy("doc_id")
  }

  /** Per-source collapse report: raw docs, exact-distinct texts, and
    * normalized-distinct classes — the number the normalization buys is
    * `n_unique - n_norm_unique` (copies exact dedup missed). */
  def report(docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(textCol)).as("n_unique"),
        countDistinct(md5(canonical(col(textCol)))).as("n_norm_unique"))
      .orderBy(sourceCol)

  /** DuckDB oracle for [[dedupNormalized]] on table `documents`. */
  def oracleSql: String =
    s"""SELECT min(doc_id) AS doc_id, count(*) AS n_collapsed
       |FROM (SELECT doc_id, md5(${canonicalSql("text")}) AS ckey
       |      FROM documents)
       |GROUP BY ckey ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[report]] on table `documents`. */
  def reportOracleSql: String =
    s"""SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
       |  count(DISTINCT md5(${canonicalSql("text")})) AS n_norm_unique
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
}
