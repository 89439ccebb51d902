package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline: token counting, quality
  * signals, and a tiny n-gram/stopword language-ID heuristic — all
  * codegen'd built-ins over a single narrow scan (no UDFs, no shuffle
  * until the final per-language aggregate).
  */
object TextStats {

  /** Whitespace-delimited token count (`\S+` runs), as BIGINT — one
    * native pass ([[graft.functions.TokenStatsExpr]]; the regexp form
    * survives as [[hofTokenCount]] for the equivalence gate). Requires a
    * prior [[graft.functions.GraftFunctions.register]] on the session. */
  def tokenCount(text: Column): Column =
    graft.functions.GraftFunctions.tokenStats(text).getItem(0)

  /** The regexp formulation [[tokenCount]] replaced (INT-typed, as
    * `regexp_count` returns). */
  private[graft] def hofTokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** `[.,!?;:]` punctuation count, as BIGINT — rides the same native
    * token_stats byte walk as [[tokenCount]] (one pass yields both, and
    * codegen subexpression elimination collapses the repeated call when
    * they appear together; the regexp form survives as
    * [[hofPunctCount]] for the equivalence gate). */
  def punctCount(text: Column): Column =
    graft.functions.GraftFunctions.tokenStats(text).getItem(2)

  /** The regexp formulation [[punctCount]] replaced (INT-typed). */
  private[graft] def hofPunctCount(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]"))

  /** Per-language corpus statistics over a documents table.
    * Exact sums (ints) + double ratios derived from them — oracle-safe. */
  def corpusStats(docs: DataFrame, langCol: String, textCol: String,
      nCharsCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
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
  }

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
    * Returns a 2-letter code or "und" when nothing matches at all.
    *
    * Scores come from ONE native text pass
    * ([[graft.functions.LangScoresExpr]] — the previous formulation ran
    * 8 `regexp_count` scans per row and was a bench hotspot; the regexp
    * form survives as [[hofLangId]] for the equivalence gate). Requires
    * a prior [[graft.functions.GraftFunctions.register]] on the session.
    *
    * The all-zero → "und" fallback is encoded as a sentinel element
    * `struct(0, "und")` in the argmax array rather than a CASE: "und"
    * sorts above every real code, so the sentinel wins exactly when no
    * real score is positive (any hit scores ≥ 1 > 0), and when a NULL
    * text NULLs every real score (null struct fields sort first). The
    * repeated `scores[i]` references collapse to one evaluation under
    * whole-stage codegen's subexpression elimination. */
  def langId(text: Column): Column = {
    // The sentinel trick is only sound while every real code sorts BELOW
    // "und": a zero-score tie must let struct(0, "und") win the array_max.
    // Adding a profile such as "zh" or "vi" would silently shadow "und"
    // for no-match text — fail fast instead (ADVICE r5).
    require((StopwordProfiles.map(_._1) ++ TrigramProfiles.map(_._1)).forall(_ < "und"),
      "langId sentinel invariant: every profile code must sort below \"und\"")
    val scores = graft.functions.GraftFunctions.langScores(text)
    val scored = StopwordProfiles.zipWithIndex.map { case ((code, _), i) =>
      struct(scores.getItem(i).as("s"), lit(code).as("l"))
    }
    val sentinel = struct(lit(0).as("s"), lit("und").as("l"))
    array_max(array(sentinel +: scored: _*)).getField("l")
  }

  /** The 8-regexp formulation [[langId]] replaced — LangScoresSpec pins
    * native scores ≡ these regexp counts on fixture + adversarial text. */
  private[graft] def hofLangScores(text: Column): Seq[Column] = {
    val lowered = lower(text)
    val tri = TrigramProfiles.toMap
    StopwordProfiles.map { case (code, words) =>
      val wordPat = words.mkString("\\b(", "|", ")\\b")
      val triPat = tri(code).mkString("(", "|", ")")
      regexp_count(lowered, lit(wordPat)) * lit(3) +
        regexp_count(lowered, lit(triPat))
    }
  }

  /** BPE-ish subword count: alphanumeric runs + standalone non-space
    * symbols, a cheap proxy for tokenizer load estimation. */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"))

  /** Gopher-style per-document quality flags: token-count bounds, mean
    * token length bounds, and a stopword-presence check, conjoined into
    * the keep decision. Pure narrow-scan arithmetic over one codegen'd
    * tokenization — zero shuffles, the 100 TB shape for row-local
    * filters. Both mean-length operands are exact BIGINT sums cast to
    * double, so the ratio (and its bound comparisons) is bit-identical
    * across engines. */
  def qualityFlags(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 80,
      minMeanLen: Double = 3.8, maxMeanLen: Double = 5.0): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // One native pass for count + total length (TokenStatsExpr). NULL
    // text naturally yields NULL stats → NULL-propagated flags, matching
    // DuckDB's len(NULL) (the drift class ADVICE r5 flagged with the old
    // size()-based form, whose legacy -1 needed an explicit guard).
    val ts = graft.functions.GraftFunctions.tokenStats(col(textCol))
    val nTokens = ts.getItem(0)
    val sumLen = ts.getItem(1)
    val meanLen = sumLen.cast("double") / nullif(nTokens, lit(0L)).cast("double")
    val okCount = nTokens >= minTokens && nTokens <= maxTokens
    val okMeanLen = meanLen >= minMeanLen && meanLen <= maxMeanLen
    // Native byte walk for the stopword-presence check (the regexp form
    // it replaces is the oracle's rendering; WordGramsSpec pins parity).
    val hasStop = graft.functions.GraftFunctions
      .wordSetCount(col(textCol), "the,and,of,to,in,is") > 0
    docs.select(col(idCol).as("doc_id"), nTokens.as("n_tokens"),
        meanLen.as("mean_tok_len"), okCount.as("ok_count"),
        okMeanLen.as("ok_mean_len"), hasStop.as("has_stopword"),
        (okCount && okMeanLen && hasStop).as("keep"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[qualityFlags]] over table `documents`. */
  def qualityFlagsOracleSql(minTokens: Int = 20, maxTokens: Int = 80,
      minMeanLen: Double = 3.8, maxMeanLen: Double = 5.0): String =
    s"""WITH t AS (
       |  SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS t FROM documents),
       |m AS (
       |  SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(list_reduce(list_prepend(0, list_transform(t, x -> length(x))),
       |      (a, b) -> a + b) AS DOUBLE)
       |      / CAST(nullif(len(t), 0) AS DOUBLE) AS mean_tok_len
       |  FROM t),
       |f AS (
       |  SELECT doc_id, n_tokens, mean_tok_len,
       |    n_tokens >= $minTokens AND n_tokens <= $maxTokens AS ok_count,
       |    mean_tok_len >= CAST($minMeanLen AS DOUBLE)
       |      AND mean_tok_len <= CAST($maxMeanLen AS DOUBLE) AS ok_mean_len,
       |    len(regexp_extract_all(lower(text),
       |      '\\b(the|and|of|to|in|is)\\b')) > 0 AS has_stopword
       |  FROM m)
       |SELECT doc_id, n_tokens, mean_tok_len, ok_count, ok_mean_len,
       |  has_stopword, ok_count AND ok_mean_len AND has_stopword AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  /** Gopher-style within-document repetition score: the fraction of word
    * `n`-grams that are repeats of an earlier gram in the SAME document
    * (`1 − distinct/total`), with the keep decision at `maxRep`. Boiler-
    * plate, chart spam and template text score high; the rule is
    * orthogonal to cross-document dedup (a corpus-unique document can
    * still be 90% self-repetition).
    *
    * Pure narrow scan, zero shuffle — the 100 TB shape for row-local
    * filters. Grams are counted as 63-bit fingerprints
    * ([[graft.functions.WordGramHashesExpr]] — no gram strings
    * materialize; within-doc fingerprint collisions are ~|grams|²/2^64 ≈
    * 10^-14) and the oracle folds the same bytes, so the gate checks the
    * shipped semantics. Documents with fewer than `n` tokens have no
    * grams: `rep_frac` is NULL and `keep` is false in both engines. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxRep: Double = 0.2): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = graft.functions.GraftFunctions.wordGramHashes(col(textCol), n)
    docs
      .select(col(idCol).as("doc_id"),
        size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .withColumn("rep_frac",
        lit(1.0) - col("n_distinct").cast("double") /
          nullif(col("n_grams"), lit(0L)).cast("double"))
      .withColumn("keep",
        col("n_grams") > 0 && col("rep_frac") <= maxRep)
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[repetitionStats]] over table `documents` — the
    * gram fingerprints fold the same bytes via
    * [[graft.oracle.Duck.gramHash63Sql]]. */
  def repetitionOracleSql(n: Int = 3, maxRep: Double = 0.2): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
       |g AS (
       |  SELECT doc_id, list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |    i -> ${graft.oracle.Duck.gramHash63Sql(s"array_to_string(t[i:i+${n - 1}], ' ')")}) AS gh
       |  FROM toks),
       |m AS (
       |  SELECT doc_id, CAST(len(gh) AS BIGINT) AS n_grams,
       |    CAST(len(list_distinct(gh)) AS BIGINT) AS n_distinct
       |  FROM g)
       |SELECT doc_id, n_grams, n_distinct,
       |  1 - CAST(n_distinct AS DOUBLE) / CAST(nullif(n_grams, 0) AS DOUBLE) AS rep_frac,
       |  n_grams > 0 AND
       |    (1 - CAST(n_distinct AS DOUBLE) / CAST(nullif(n_grams, 0) AS DOUBLE))
       |      <= CAST($maxRep AS DOUBLE) AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  /** Conservative PII patterns shared by the Spark and oracle renderings
    * of [[piiScrub]]. Kept to constructs Java regex and DuckDB's RE2
    * treat identically (character classes, greedy `+`, literals), so
    * both engines match the same spans. */
  val EmailPattern = "[a-z0-9._]+@[a-z0-9]+\\.[a-z]+"
  val PhonePattern = "\\+1-555-0[0-9]+"
  val IpPattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrubbing: count and redact email addresses, phone numbers,
    * IPv4 addresses, and Luhn-valid credit-card digit runs (`<EMAIL>` /
    * `<PHONE>` / `<IP>` / `<CCN>` placeholders) — the row-local cleaning
    * stage a curation pipeline runs before training. Zero shuffle; the
    * scrubbed text is fingerprinted (rolling_hash) so the oracle checks
    * the REDACTED BYTES exactly, not just the counts. Credit cards are
    * deliberately NOT a regex: a maximal 13–19-digit run is redacted
    * only when the Luhn checksum passes, so real card shapes go and
    * arbitrary long numbers stay (see [[graft.functions.PiiScrubExpr]]
    * for the per-category exactness argument).
    *
    * Counts and the redacted text come from ONE native expression
    * ([[graft.functions.PiiScrubExpr]], four byte passes — the regexp
    * formulation ran full regex passes per row and was the slowest
    * scan at the 64× probe; it survives as [[hofPiiScrub]] for the
    * equivalence gate). */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val st = graft.functions.GraftFunctions.piiScrub(col(textCol))
    val scrubbed = st.getField("scrubbed")
    docs.select(col(idCol).as("doc_id"),
        st.getField("n_emails").as("n_emails"),
        st.getField("n_phones").as("n_phones"),
        st.getField("n_ips").as("n_ips"),
        st.getField("n_ccns").as("n_ccns"),
        length(scrubbed).cast("long").as("clean_len"),
        graft.functions.GraftFunctions.rollingHash(scrubbed).as("scrub_fp"))
      .orderBy("doc_id")
  }

  /** The regexp/HOF formulation [[piiScrub]] replaced — the
    * equivalence-test mirror (PipelineSpec pins identical counts and
    * scrubbed bytes on fixture + adversarial text). Emails/phones/IPs
    * are `regexp_replace` stages; the Luhn-gated CCN stage is a
    * split-on-digit-runs + conditional-rejoin HOF chain (a regex cannot
    * express the checksum), with each count taken on the intermediate
    * its stage scans — the same chain the byte passes walk. */
  private[graft] def hofPiiScrub(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val t2 = regexp_replace(
      regexp_replace(col(textCol), lit(EmailPattern), lit("<EMAIL>")),
      lit(PhonePattern), lit("<PHONE>"))
    val t3 = regexp_replace(t2, lit(IpPattern), lit("<IP>"))
    val toks = regexp_extract_all(t3, lit("[0-9]+"), lit(0))
    val segs = split(t3, "[0-9]+", -1)
    def luhnOk(tok: Column): Column = {
      def digit(j: Column): Column = {
        val d = ascii(tok.substr(length(tok) - j, lit(1))) - lit(48)
        when(j % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }
      aggregate(sequence(lit(0), length(tok) - 1), lit(0),
        (s, j) => s + digit(j)) % 10 === 0
    }
    def isCcn(tok: Column): Column =
      length(tok).between(13, 19) && luhnOk(tok)
    val scrubbed = when(size(toks) === 0, t3).otherwise(
      aggregate(sequence(lit(1), size(toks)), element_at(segs, 1),
        (acc, i) => concat(acc,
          when(isCcn(element_at(toks, i)), lit("<CCN>"))
            .otherwise(element_at(toks, i)),
          element_at(segs, i + 1))))
    docs.select(col(idCol).as("doc_id"),
        regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
        regexp_count(col(textCol), lit(PhonePattern)).cast("long").as("n_phones"),
        regexp_count(t2, lit(IpPattern)).cast("long").as("n_ips"),
        size(filter(toks, isCcn _)).cast("long").as("n_ccns"),
        length(scrubbed).cast("long").as("clean_len"),
        graft.functions.GraftFunctions.rollingHash(scrubbed).as("scrub_fp"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle fragment for [[piiScrub]] over a relation exposing
    * `(doc_id, t)` — the caller supplies the planted-PII derivation so
    * query and oracle stay adjacent at the registration site. */
  def piiScrubOracleSql(sourceSql: String): String = {
    // The Scala literals already hold single-backslash regex escapes,
    // which is exactly what DuckDB's RE2 expects inside '...'. The CCN
    // stage mirrors hofPiiScrub: split t3 on maximal digit runs, redact
    // a run iff 13–19 digits AND the Luhn sum ≡ 0 (mod 10), rejoin.
    val email = EmailPattern
    val phone = PhonePattern
    val ip = IpPattern
    def luhnDigit(tok: String) =
      s"(ascii(substr($tok, length($tok) - __j, 1)) - 48)"
    def ccnOk(tok: String) =
      s"""(length($tok) BETWEEN 13 AND 19 AND
         |      list_sum(list_transform(range(0, length($tok)), __j ->
         |        CASE WHEN __j % 2 = 1 THEN
         |          CASE WHEN 2 * ${luhnDigit(tok)} > 9
         |            THEN 2 * ${luhnDigit(tok)} - 9
         |            ELSE 2 * ${luhnDigit(tok)} END
         |        ELSE ${luhnDigit(tok)} END)) % 10 = 0)""".stripMargin
    s"""WITH p AS ($sourceSql),
       |s1 AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
       |    CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
       |    regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
       |      '$phone', '<PHONE>', 'g') AS t2
       |  FROM p),
       |s2 AS (
       |  SELECT doc_id, n_emails, n_phones,
       |    CAST(len(regexp_extract_all(t2, '$ip')) AS BIGINT) AS n_ips,
       |    regexp_replace(t2, '$ip', '<IP>', 'g') AS t3
       |  FROM s1),
       |s3 AS (
       |  SELECT doc_id, n_emails, n_phones, n_ips,
       |    regexp_extract_all(t3, '[0-9]+') AS toks,
       |    regexp_split_to_array(t3, '[0-9]+') AS segs
       |  FROM s2),
       |s4 AS (
       |  SELECT doc_id, n_emails, n_phones, n_ips,
       |    CAST(len(list_filter(toks, __tok -> ${ccnOk("__tok")})) AS BIGINT)
       |      AS n_ccns,
       |    list_reduce(list_prepend(segs[1],
       |      list_transform(range(1, len(toks) + 1), __i ->
       |        (CASE WHEN ${ccnOk("toks[__i]")} THEN '<CCN>'
       |          ELSE toks[__i] END) || segs[__i + 1])),
       |      (__a, __b) -> __a || __b) AS scrubbed
       |  FROM s3)
       |SELECT doc_id, n_emails, n_phones, n_ips, n_ccns,
       |  CAST(length(scrubbed) AS BIGINT) AS clean_len,
       |  ${graft.oracle.Duck.rollingHashSql("scrubbed")} AS scrub_fp
       |FROM s4 ORDER BY doc_id""".stripMargin
  }

  // ---- DuckDB oracle mirrors of langId -------------------------------
  // Generated from the SAME profile tables as the Column form above, so
  // the Spark expression and the oracle SQL cannot drift apart.

  /** Per-language score expression (DuckDB SQL) over column `text`,
    * mirroring the `3×stopwords + trigrams` score in [[langId]]. */
  private def langScoreSql(code: String): String = {
    val wordPat = StopwordProfiles.toMap.apply(code).mkString("\\b(", "|", ")\\b")
    val triPat = TrigramProfiles.toMap.apply(code).mkString("(", "|", ")")
    // coalesce: NULL text must score 0 so the argmax CASE lands in the
    // `greatest(...) = 0 → 'und'` branch — mirroring Spark, where the NULL
    // score fails `best.s > 0` and langId yields 'und' (ADVICE r4).
    s"coalesce(3 * len(regexp_extract_all(lower(text), '$wordPat')) + " +
      s"len(regexp_extract_all(lower(text), '$triPat')), 0)"
  }

  /** `SELECT`-list fragments `<score> AS s_<code>`, one per language. */
  def langScoreSqlFragments: Seq[String] =
    StopwordProfiles.map { case (code, _) => s"${langScoreSql(code)} AS s_$code" }

  /** Argmax CASE over the `s_<code>` score columns. Codes are tested in
    * DESCENDING lexicographic order with `>=` comparisons, which realizes
    * exactly [[langId]]'s tie-break (ties go to the larger code — the
    * struct-max semantics of `array_max(struct(score, code))`). */
  def langIdCaseSql: String = {
    val codes = StopwordProfiles.map(_._1)
    val desc = codes.sorted.reverse
    val whens = desc.init.zipWithIndex.map { case (c, i) =>
      val rest = desc.drop(i + 1)
      s"WHEN ${rest.map(r => s"s_$c >= s_$r").mkString(" AND ")} THEN '$c'"
    }
    s"CASE WHEN greatest(${codes.map("s_" + _).mkString(", ")}) = 0 THEN 'und' " +
      whens.mkString(" ") + s" ELSE '${desc.last}' END"
  }

  /** Full DuckDB oracle for per-doc [[langId]] over table `documents`. */
  def langIdOracleSql: String =
    s"""SELECT doc_id, $langIdCaseSql AS lang_id
       |FROM (SELECT doc_id, ${langScoreSqlFragments.mkString(", ")} FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for the end-to-end curation pipeline: quality filter →
    * detected-language filter → exact dedup (min doc_id per identical
    * text, keyed on md5(text) exactly as the Spark chain keys its
    * shuffle — both engines' md5 hash the same UTF-8 bytes) →
    * per-language corpus totals. Mirrors the q36 DataFrame chain stage
    * for stage. */
  def curationOracleSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       |    ${langScoreSqlFragments.mkString(", ")}
       |  FROM documents),
       |labeled AS (
       |  SELECT doc_id, text, n_tokens, n_punct, $langIdCaseSql AS lang_id
       |  FROM scored),
       |kept AS (
       |  SELECT * FROM labeled
       |  WHERE n_tokens >= 5 AND n_punct * 2 <= n_tokens AND lang_id <> 'und'),
       |dedup AS (
       |  SELECT min(doc_id) AS doc_id, min(lang_id) AS lang_id,
       |         min(n_tokens) AS n_tokens
       |  FROM kept GROUP BY md5(text))
       |SELECT lang_id, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  min(doc_id) AS first_doc
       |FROM dedup GROUP BY lang_id ORDER BY lang_id""".stripMargin
}
