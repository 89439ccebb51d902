package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline: token counting, quality
  * signals, and a tiny n-gram/stopword language-ID heuristic — all
  * codegen'd built-ins over a single narrow scan (no UDFs, no shuffle
  * until the final per-language aggregate).
  */
object TextStats {

  /** Whitespace-delimited token count (`\S+` runs). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** Quality signals: punctuation density and mean token length. */
  def punctCount(text: Column): Column = regexp_count(text, lit("[.,!?;:]"))

  /** Per-language corpus statistics over a documents table.
    * Exact sums (ints) + double ratios derived from them — oracle-safe. */
  def corpusStats(docs: DataFrame, langCol: String, textCol: String,
      nCharsCol: String): DataFrame =
    docs.groupBy(langCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nCharsCol)).as("total_chars"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        sum(regexp_count(col(textCol), lit("\\bthe\\b")).cast("long")).as("the_tokens"),
        sum(punctCount(col(textCol)).cast("long")).as("total_punct"))
      .withColumn("avg_chars", col("total_chars").cast("double") / col("n_docs"))
      .withColumn("tokens_per_doc", col("total_tokens").cast("double") / col("n_docs"))
      .orderBy(langCol)

  /** DuckDB oracle for [[corpusStats]] on table `documents`. */
  val corpusStatsOracleSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '\bthe\b'))) AS BIGINT) AS the_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[.,!?;:]'))) AS BIGINT) AS total_punct,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS DOUBLE) / count(*) AS tokens_per_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Stopword profiles for the language-ID heuristic (word 1-grams). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans"))

  /** Characteristic character trigrams per language (the n-gram half of
    * the heuristic — catches text where function words are rare). */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "tio"),
    "de" -> Seq("sch", "ein", "ich", "der", "che"),
    "es" -> Seq("que", "los", "ent", "ción", "ado"),
    "fr" -> Seq("les", "ent", "une", "eur", "aux"))

  /** Heuristic language ID: argmax of (3×stopword hits + trigram hits);
    * ties resolve to the lexicographically larger code (deterministic).
    * Returns a 2-letter code or "und" when nothing matches at all. */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    val tri = TrigramProfiles.toMap
    val scored = StopwordProfiles.map { case (code, words) =>
      val wordPat = words.mkString("\\b(", "|", ")\\b")
      val triPat = tri(code).mkString("(", "|", ")")
      val score = regexp_count(lowered, lit(wordPat)) * lit(3) +
        regexp_count(lowered, lit(triPat))
      struct(score.as("s"), lit(code).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** BPE-ish subword count: alphanumeric runs + standalone non-space
    * symbols, a cheap proxy for tokenizer load estimation. */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"))
}
