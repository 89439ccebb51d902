package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Trigram-index-accelerated REGEX search — the index-speed path for
  * the reference's defining operation: kbrowse exists to regex-grep
  * record values (`/root/reference/src/kbrowse/search.clj:74-81`
  * re-finds the compiled pattern per record, a full scan per query).
  * The positional sidecar ([[PhraseIndex]]) answers exact phrases and
  * proximity, but a regex with classes/quantifiers/alternation still
  * had only the full text scan. This module closes that gap with the
  * public codesearch design (R. Cox, "Regular Expression Matching with
  * a Trigram Index", 2012): a stored character-trigram presence index
  * plus a CONSERVATIVE compiler from the pattern to required literal
  * factors. Candidates = docs holding every trigram of every required
  * factor of some alternation branch (a provable SUPERSET of the
  * matches); the exact `rlike` then confirms on candidate rows only —
  * regex evaluation cost collapses from corpus-sized to
  * candidate-sized, and the index never has to be regex-aware.
  *
  * Layout: `{table}` (gram: 3-char string, doc_id, c, src) bucketed +
  * sorted by gram — a probe's `gram IN (...)` restriction prunes
  * buckets and sorted row groups exactly like the BM25 probe's term
  * restriction — and `{table}_meta` (buckets). Grams are per-doc
  * DISTINCT (presence, not frequency): landings append c=+1 rows,
  * retirements the same rows negated, readers fold per (gram, doc_id)
  * keeping nets > 0 (raising on negatives), compaction restores one
  * row per key. `src` markers are operation-namespaced
  * ([[CorpusWriter.landTag]]); takedowns are O(deleted docs).
  *
  * Soundness contract (RegexIndexSpec pins it): for every string with
  * an (unanchored) match of the pattern, some top-level alternation
  * branch matched, and that branch's required factors — maximal
  * literal runs that survive quantifier analysis — each occur in the
  * string verbatim; length-≥3 factors make every trigram of every
  * factor present (the index is case-folded, so a leading `(?i)` is
  * served too — nomination folds, the confirm keeps the pattern's own
  * case semantics). When the analysis cannot GUARANTEE a factor (class
  * at top level, mid-pattern flag groups, a lookaround, `\d`-style
  * escapes swallowing every literal run), it returns None and the
  * probe either refuses loudly or — under `allowScan = true` — states
  * the full scan it is about to pay. Unanalyzable never means wrong,
  * only unpruned.
  */
object RegexIndex {

  /** Distinct character trigrams of CASE-FOLDED `textCol` (empty below
    * 3 chars — a length-≥3 factor can never match such a doc, so the
    * index correctly never nominates it). The index is case-folded so
    * one sidecar serves both case-sensitive and `(?i)` probes: a doc
    * containing a factor verbatim (or any case variant, for `(?i)`)
    * always contains its folded trigrams — nomination stays a superset
    * either way, and the exact `rlike` keeps the original pattern's
    * case semantics. Folding costs a little selectivity (case-variant
    * collisions), never correctness.
    *
    * The fold is ASCII-ONLY `translate`, NOT `lower()` (ADVICE r20):
    * `lower()` on any non-pure-ASCII string falls back to
    * `String.toLowerCase()` under the JVM DEFAULT locale, so under a
    * tr/az locale a mixed-content doc stores 'I' as dotless 'ı' while
    * the probe folds with Locale.ROOT ('i') — an ASCII factor
    * containing i/I would silently never nominate that doc, a missed
    * true match the rlike confirm cannot recover. Probe factors are
    * already ASCII-guarded ([[candidatesFromIndex]]), so only ASCII
    * folding can ever matter for nomination; `translate` folds exactly
    * that range, locale-independently, in codegen. */
  private def triGrams(textCol: Column): Column = {
    val folded = translate(textCol,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    // The folded text binds ONCE PER ROW through a single-element
    // array + lambda variable (the hofSimhash binding trick): inlining
    // `folded` directly into the per-position lambda re-evaluated the
    // fold once per trigram POSITION — O(len²) per doc — which the r21
    // 64× probe measured as a 455 s index landing (vs ~120 s r20).
    element_at(transform(array(folded), t =>
      when(length(t) >= 3,
        array_distinct(transform(sequence(lit(1), length(t) - 2),
          i => t.substr(i, lit(3)))))
        .otherwise(array().cast("array<string>"))), 1)
  }

  /** One landing's (gram, doc_id, c, src) presence rows. */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
      src: String, sign: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode_outer(triGrams(col(textCol))).as("gram"))
      .filter(col("gram").isNotNull)
      .select(col("gram"), col("doc_id"),
        lit(sign.toLong).as("c"), lit(src).cast("string").as("src"))

  /** Store the corpus's trigram index. */
  def writeRegexIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    CorpusWriter.dropOrphanedLocation(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_srcs")
    CorpusWriter.dropOrphanedLocation(spark, s"${table}_meta")
    gramRows(docs, idCol, textCol, src = null, sign = 1)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "gram").sortBy("gram")
      .format("parquet").saveAsTable(table)
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_meta")
  }

  private def metaBuckets(spark: SparkSession, table: String): Int = {
    val meta = spark.table(s"${table}_meta").collect()
    require(meta.length == 1,
      s"malformed regex-index meta: ${meta.length} rows")
    meta(0).getAs[Int]("buckets")
  }

  /** Land another doc batch (disjoint-batch contract, mandatory
    * per-batch `src` — a replayed tag is a skipped no-op). */
  def appendToRegexIndex(docs: DataFrame, idCol: String,
      textCol: String, table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.landTag(src)
    if (CorpusWriter.srcApplied(spark, table, tag)) return
    gramRows(docs, idCol, textCol, tag, sign = 1)
      .write.mode(SaveMode.Append)
      .bucketBy(metaBuckets(spark, table), "gram").sortBy("gram")
      .format("parquet").saveAsTable(table)
    CorpusWriter.recordSrc(spark, table, tag)
  }

  /** Retire docs: their presence rows append NEGATED — O(deleted
    * docs), in force at the read fold from the commit on. */
  def retireFromRegexIndex(docs: DataFrame, idCol: String,
      textCol: String, table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.retireTag(src)
    if (CorpusWriter.srcApplied(spark, table, tag)) return
    gramRows(docs, idCol, textCol, tag, sign = -1)
      .write.mode(SaveMode.Append)
      .bucketBy(metaBuckets(spark, table), "gram").sortBy("gram")
      .format("parquet").saveAsTable(table)
    CorpusWriter.recordSrc(spark, table, tag)
  }

  /** Fold to one row per (gram, doc_id), dropping zero-net tombstones
    * (raises on over-retirement). Answer-invisible. */
  def compactRegexIndex(spark: SparkSession, table: String): Unit =
    CorpusWriter.compactAdditiveIndexMulti(spark, table,
      Seq("gram", "doc_id"), "regex trigram index")

  /** Probe-side case folding: Locale.ROOT, NEVER the JVM default —
    * under a tr_TR locale `"I".toLowerCase` is dotless 'ı' while the
    * index side ([[triGrams]]' ASCII-only `translate`) stores 'i',
    * and an ASCII factor would silently nominate nothing. Both sides
    * are locale-independent on the ASCII range the
    * [[candidatesFromIndex]] guard admits, so they provably agree. */
  private def fold(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  /** Live (gram, doc_id) presence of `grams` — bucket-pruned scan,
    * bucket-local refcount fold. */
  private def liveGrams(spark: SparkSession, table: String,
      grams: Seq[String]): DataFrame =
    CorpusWriter.liveAdditiveKeysMulti(
      spark.table(table).filter(col("gram").isin(grams: _*)),
      Seq("gram", "doc_id"), "regex trigram index")

  // -------------------------------------------------------------------
  // Pattern analysis: regex → required literal factors (conservative).
  // -------------------------------------------------------------------

  /** Required literal factors per top-level alternation branch, or
    * None when no sound factoring exists. `Some(branches)` guarantees:
    * any string containing a match of `pattern` contains, for at least
    * one branch, EVERY factor of that branch as a verbatim substring;
    * every factor has length ≥ 3 (so its trigrams exist in any doc it
    * occurs in).
    *
    * The analysis is deliberately conservative — it must never
    * over-claim. Handled: literal runs; punctuation escapes (`\.`
    * contributes '.'); `\n \r \t \f` as their control characters;
    * class/dot/group atoms as run BREAKS (their content claims
    * nothing); `? *` and `{0,…}` dropping the preceding literal from
    * its run; `+` and `{1,…}` keeping it (the first repetition is
    * adjacent) but breaking the run after it; reluctant/possessive
    * suffixes; anchors `^ $ \b \B` as breaks; top-level `|` as a
    * branch split (respecting groups/classes/escapes). Bail-to-None:
    * `(?` groups that are not plain `(?:` (flags like `(?i)` poison
    * every literal after them; lookarounds and named groups ride the
    * same prefix), `\p \x \u \c \k` and backreference escapes (they
    * carry operands this analysis does not model), dangling
    * quantifiers or braces, unbalanced structure, and any branch whose
    * every literal run is shorter than 3. */
  def requiredLiterals(pattern: String): Option[Seq[Seq[String]]] = {
    // A LEADING `(?i)` flags the whole pattern (both engines keep the
    // flag across top-level alternatives): the case-folded index
    // nominates its factors soundly, so strip and analyze the rest.
    // Mid-pattern flag groups still bail in skipGroup — a flag whose
    // scope this analysis does not model must poison the pattern.
    val body =
      if (pattern.startsWith("(?i)")) pattern.substring(4) else pattern
    if (body.isEmpty) return None
    splitAlternation(body).flatMap { branches =>
      val analyzed = branches.map(branchFactors)
      // One unanalyzable branch poisons the union: a match may arrive
      // through it carrying none of the other branches' factors.
      if (analyzed.exists(_.isEmpty)) None
      else Some(analyzed.map(_.get))
    }
  }

  /** Split on top-level `|`, respecting escapes, classes, groups.
    * None on unbalanced structure. */
  private def splitAlternation(p: String): Option[Seq[String]] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var depth = 0
    var inClass = false
    while (i < p.length) {
      val ch = p.charAt(i)
      ch match {
        case '\\' =>
          if (i + 1 >= p.length) return None
          cur.append(ch).append(p.charAt(i + 1)); i += 1
        case '[' if !inClass => inClass = true; cur.append(ch)
        case ']' if inClass => inClass = false; cur.append(ch)
        case '(' if !inClass => depth += 1; cur.append(ch)
        case ')' if !inClass =>
          depth -= 1; if (depth < 0) return None; cur.append(ch)
        case '|' if !inClass && depth == 0 =>
          out += cur.result(); cur.clear()
        case _ => cur.append(ch)
      }
      i += 1
    }
    if (depth != 0 || inClass) return None
    out += cur.result()
    Some(out.result())
  }

  /** Skip a character class starting at `[`; returns the index just
    * past the closing `]`, or -1 if unterminated. */
  private def skipClass(b: String, start: Int): Int = {
    var i = start + 1
    if (i < b.length && b.charAt(i) == '^') i += 1
    if (i < b.length && b.charAt(i) == ']') i += 1 // literal ] first
    while (i < b.length) {
      b.charAt(i) match {
        case '\\' => i += 2
        case ']' => return i + 1
        case _ => i += 1
      }
    }
    -1
  }

  /** Skip a balanced group starting at `(`; returns the index just
    * past the closing `)`, or -1 if unterminated / not plainly
    * skippable (a `(?` prefix other than `(?:` bails — inline flags
    * would poison literals AFTER the group, lookarounds and named
    * groups share the prefix and are not worth modelling). */
  private def skipGroup(b: String, start: Int): Int = {
    var i = start + 1
    if (i < b.length && b.charAt(i) == '?') {
      if (i + 1 < b.length && b.charAt(i + 1) == ':') i += 2
      else return -1
    }
    var depth = 1
    var inClass = false
    while (i < b.length) {
      b.charAt(i) match {
        case '\\' => i += 1
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass => depth += 1
        case ')' if !inClass =>
          depth -= 1; if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Parse a `{m[,n]}` quantifier at `start`; returns (indexPastBrace,
    * minRepeats) or None if not a well-formed counted quantifier. */
  private def parseBraces(b: String, start: Int): Option[(Int, Int)] = {
    var i = start + 1
    val m = new StringBuilder
    while (i < b.length && b.charAt(i).isDigit) { m.append(b.charAt(i)); i += 1 }
    if (m.isEmpty) return None
    if (i < b.length && b.charAt(i) == ',') {
      i += 1
      while (i < b.length && b.charAt(i).isDigit) i += 1
    }
    if (i >= b.length || b.charAt(i) != '}') return None
    Some((i + 1, m.result().toInt))
  }

  /** Escapes whose factor contribution is a known single literal. */
  private def literalEscape(c: Char): Option[Char] = c match {
    case 'n' => Some('\n')
    case 'r' => Some('\r')
    case 't' => Some('\t')
    case 'f' => Some('\f')
    case c if !c.isLetterOrDigit => Some(c) // \. \\ \+ \[ \| \ etc.
    case _ => None
  }

  /** Zero-width / class-like escapes that break a run but claim
    * nothing. Operand-carrying escapes are NOT here — they bail. */
  private def breakingEscape(c: Char): Boolean =
    "dDwWsSbBAZzG".indexOf(c.toInt) >= 0

  /** Maximal required literal runs (length ≥ 3) of one branch, or
    * None when unanalyzable / factorless. */
  private def branchFactors(b: String): Option[Seq[String]] = {
    val runs = Seq.newBuilder[String]
    val run = new StringBuilder
    def break(): Unit = { runs += run.result(); run.clear() }
    var i = 0
    // After any atom: consume a quantifier if present. `lastLiteral`
    // is true when the atom was a literal char sitting at run's end
    // (so `?`/`*`/`{0,…}` must drop it).
    def quantify(lastLiteral: Boolean): Boolean = {
      if (i >= b.length) return true
      val keepMin: Option[Int] = b.charAt(i) match {
        case '?' => i += 1; Some(0)
        case '*' => i += 1; Some(0)
        case '+' => i += 1; Some(1)
        case '{' =>
          parseBraces(b, i) match {
            case Some((next, m)) => i = next; Some(m)
            case None => return false // dangling `{` — bail, not guess
          }
        case _ => None
      }
      keepMin match {
        case None => true
        case Some(m) =>
          // Reluctant / possessive suffix rides along.
          if (i < b.length && (b.charAt(i) == '?' || b.charAt(i) == '+'))
            i += 1
          if (lastLiteral && m == 0 && run.nonEmpty)
            run.deleteCharAt(run.length - 1)
          break()
          true
      }
    }
    while (i < b.length) {
      b.charAt(i) match {
        case '\\' =>
          if (i + 1 >= b.length) return None
          val c = b.charAt(i + 1)
          literalEscape(c) match {
            case Some(lit0) =>
              i += 2; run.append(lit0)
              if (!quantify(lastLiteral = true)) return None
            case None if breakingEscape(c) =>
              i += 2; break()
              if (!quantify(lastLiteral = false)) return None
            case None => return None // \p \x \u \c \k, backrefs: operands
          }
        case '[' =>
          val next = skipClass(b, i)
          if (next < 0) return None
          i = next; break()
          if (!quantify(lastLiteral = false)) return None
        case '(' =>
          val next = skipGroup(b, i)
          if (next < 0) return None
          i = next; break()
          if (!quantify(lastLiteral = false)) return None
        case '.' =>
          i += 1; break()
          if (!quantify(lastLiteral = false)) return None
        case '^' | '$' =>
          i += 1; break()
        case ')' | ']' => return None // unbalanced (splitter guards '(')
        case '?' | '*' | '+' | '{' => return None // dangling quantifier
        case ch =>
          i += 1; run.append(ch)
          if (!quantify(lastLiteral = true)) return None
      }
    }
    break()
    val factors = runs.result().filter(_.length >= 3)
    if (factors.isEmpty) None else Some(factors)
  }

  // -------------------------------------------------------------------
  // Probes.
  // -------------------------------------------------------------------

  /** Per-branch FOLDED gram requirement of `pattern`, or None when the
    * pattern has no sound factoring or a factor leaves ASCII (the
    * Locale.ROOT probe fold and the index's ASCII `translate` provably
    * agree on ASCII; beyond it, folding disagreements could turn the
    * superset into a miss — bail to the scan instead). */
  private[pipeline] def branchGrams(pattern: String): Option[Seq[Seq[String]]] =
    requiredLiterals(pattern)
      .filter(_.forall(_.forall(_.forall(_ < 128))))
      .map(_.map(_.flatMap(f => fold(f).sliding(3)).distinct))

  /** Drop stopword-common grams from each branch's requirement
    * (VERDICT r20 #2, Cox 2012: query only SELECTIVE trigrams).
    * Nomination is conjunctive — docs holding EVERY required gram — so
    * dropping a gram can only GROW the candidate superset: soundness
    * is free, and what it buys is a bound on nomination cost when a
    * pattern contains a common English run (a required gram like
    * `"the"` otherwise reads a corpus-wide posting slice per probe).
    * Governed by `spark.graft.regexMaxGramDf` (a doc-frequency bound;
    * unset = keep every gram): one bucket-pruned df aggregate over the
    * probe's grams (pattern-sized collect), grams with df > bound are
    * dropped. None when some branch loses its LAST gram — that branch
    * can no longer nominate, so the probe must bail to the scan rather
    * than silently fetch the corpus. */
  private def selectiveGrams(spark: SparkSession, table: String,
      branches: Seq[Seq[String]]): Option[Seq[Seq[String]]] = {
    val bound = spark.conf.getOption("spark.graft.regexMaxGramDf")
    if (bound.isEmpty) return Some(branches)
    dropCommonGrams(branches,
      gramDfs(spark, table, branches.flatten.distinct), bound.get.toLong)
  }

  /** One bucket-pruned df aggregate over `grams` — the probe shared by
    * [[selectiveGrams]] and the BATCHED path (ADVICE r21: per-pattern
    * probes under `regexMaxGramDf` ran N restricted scans + N collects
    * before the shared barrier, undercutting the batch's one-scan
    * contract; the batch now runs this ONCE over the union). */
  private def gramDfs(spark: SparkSession, table: String,
      grams: Seq[String]): Map[String, Long] =
    liveGrams(spark, table, grams)
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The pure filter half of [[selectiveGrams]]: drop grams with
    * df > maxDf from each branch; None when a branch loses its last
    * gram (it can no longer nominate — bail to the scan).
    * df 0 (gram absent from the index) is maximally selective: the
    * branch nominates nothing, which is exactly right. */
  private def dropCommonGrams(branches: Seq[Seq[String]],
      dfs: Map[String, Long], maxDf: Long): Option[Seq[Seq[String]]] = {
    val kept = branches.map(_.filter(g => dfs.getOrElse(g, 0L) <= maxDf))
    if (kept.exists(_.isEmpty)) None else Some(kept)
  }

  /** Candidate doc_ids from the STORED index — docs holding every
    * case-folded trigram of every required factor of some branch; a
    * provable superset of the regex's matches. None when the pattern
    * has no sound factoring ([[branchGrams]]) or when stopword-gram
    * dropping leaves a branch unservable ([[selectiveGrams]]). The
    * scan is gram-restricted (bucket-pruned); the fold is
    * bucket-local; each branch is one counting aggregate over its
    * posting slices. */
  def candidatesFromIndex(spark: SparkSession, table: String,
      pattern: String): Option[DataFrame] =
    branchGrams(pattern)
      .flatMap(selectiveGrams(spark, table, _))
      .map { branches =>
        branches.map { grams =>
          liveGrams(spark, table, grams)
            .groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
            .filter(col("n_grams") === grams.size)
            .select("doc_id")
        }.reduce(_ unionByName _).distinct()
      }

  /** Regex search answered through the index: candidates nominate,
    * `rlike` confirms — equal to the full-scan `rlike` by
    * construction (RegexIndexSpec pins it), with the regex evaluated
    * on candidate rows only. The candidate frame (distinct doc_ids of
    * selective factors) joins semi into the confirm with NO forced
    * broadcast — AQE broadcasts it at runtime whenever it is actually
    * small, and a corpus-sized candidate set (a low-selectivity
    * pattern) degrades to a shuffled join instead of hitting the 8 GB
    * broadcast wall; on a doc_id-sorted corpus layout the candidate
    * restriction additionally prunes row groups by footer stats.
    * Returns matching doc_ids ordered.
    *
    * Unanalyzable patterns (no guaranteed factor — class-only
    * patterns, mid-pattern flag groups, `\d`-style escapes
    * everywhere) refuse loudly unless `allowScan = true`, which
    * states and pays the full scan the reference pays on every
    * query. */
  def searchFromIndex(spark: SparkSession, table: String,
      docs: DataFrame, idCol: String, textCol: String, pattern: String,
      allowScan: Boolean = false): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    candidatesFromIndex(spark, table, pattern) match {
      case Some(cands) =>
        // The barrier is load-bearing, not a cache nicety: without it
        // Catalyst pushes the rlike (it references only the docs side)
        // BELOW the semi-join, evaluating the regex corpus-wide — the
        // exact full scan the index exists to avoid. Materializing the
        // candidate-restricted rows first pins the regex to
        // candidate-sized work (PlanAuditSpec holds the shape).
        // No forced broadcast (VERDICT r20 #1, the liveLens fix): a
        // low-selectivity pattern's candidate set approaches corpus doc
        // count, and a forced broadcast fails at the 8 GB wall exactly
        // when it is largest — AQE picks broadcast at runtime whenever
        // the set is actually small; the barrier pins the rlike above
        // the join under ANY strategy.
        graft.ops.Materialize.barrier(
            base.join(cands, Seq("doc_id"), "left_semi"))
          .filter(col("__text").rlike(pattern))
          .select("doc_id").orderBy("doc_id")
      case None =>
        require(allowScan,
          s"regex '$pattern' has no required literal factor >= 3 chars " +
            "within ASCII (unanalyzable pattern, factors outside ASCII " +
            "where case-fold agreement is unprovable, or no gram " +
            "selective under the configured spark.graft.regexMaxGramDf) " +
            "— the index cannot prune it; pass allowScan = true to pay " +
            "the full corpus scan explicitly")
        base.filter(col("__text").rlike(pattern))
          .select("doc_id").orderBy("doc_id")
    }
  }

  /** BATCHED regex search — N patterns against one index scan (the
    * q190/BatchScaleProbe |Q|-flat discipline at regex grain: a
    * takedown sweep or PII audit carries hundreds of patterns, and N
    * independent probes would re-read the shared gram slices N times).
    * ONE bucket-pruned scan restricted to the union of every pattern's
    * folded trigrams materializes once; each (pattern, branch)
    * candidate aggregate and each pattern's confirm filter (a literal
    * regex — codegen compiles each once) reads that frame. Returns
    * (pattern_id, doc_id) for every match of every pattern, ordered.
    * Every pattern must be analyzable — a batch sweep that silently
    * fell back to N full scans would be the opposite of its promise,
    * so the unanalyzable member raises, naming itself. */
  def searchManyFromIndex(spark: SparkSession, table: String,
      docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "patterns must be non-empty")
    // Factor every pattern FIRST, then (only if the df bound is set)
    // run ONE union df probe and filter each pattern's branches from
    // the shared map — N per-pattern probes would re-scan the shared
    // gram slices N times (ADVICE r21).
    val factored: Seq[(Int, String, Option[Seq[Seq[String]]])] =
      patterns.zipWithIndex.map { case (p, i) => (i, p, branchGrams(p)) }
    val dfBound = spark.conf.getOption("spark.graft.regexMaxGramDf")
      .map(_.toLong)
    val sharedDfs: Map[String, Long] = dfBound match {
      case Some(_) => gramDfs(spark, table,
        factored.flatMap(_._3.toSeq.flatten.flatten).distinct)
      case None => Map.empty
    }
    val compiled: Seq[(Int, Seq[Seq[String]])] =
      factored.map { case (i, p, br) =>
        val branches = dfBound match {
          case Some(b) => br.flatMap(dropCommonGrams(_, sharedDfs, b))
          case None => br
        }
        require(branches.isDefined,
          s"batched regex search: pattern $i '$p' has no required " +
            "literal factor >= 3 chars within ASCII (or no selective " +
            "gram under spark.graft.regexMaxGramDf) — run it alone " +
            "via searchFromIndex(allowScan = true) instead")
        (i, branches.get)
      }
    val allGrams = compiled.flatMap(_._2.flatten).distinct
    // One restricted scan + fold, many consumers.
    val live = graft.ops.Materialize.barrier(
      liveGrams(spark, table, allGrams))
    // Also materialized: the fetch AND every per-pattern confirm read
    // it — without this each of the N confirms would recompute the
    // whole candidate union from the gram fold.
    val cands = graft.ops.Materialize.barrier(
      compiled.flatMap { case (pid, branches) =>
        branches.map { grams =>
          live.filter(col("gram").isin(grams: _*))
            .groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
            .filter(col("n_grams") === grams.size)
            .select(lit(pid.toLong).as("pattern_id"), col("doc_id"))
        }
      }.reduce(_ unionByName _).distinct())
    // One candidate-restricted text fetch serves every pattern's
    // confirm (a doc nominated by several patterns fetches once).
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    val fetched = graft.ops.Materialize.barrier(
      base.join(cands.select("doc_id").distinct(),
        Seq("doc_id"), "left_semi"))
    // Confirm: ONE inner join pairs each fetched doc with the
    // pattern_ids that nominated it, then a CASE dispatch runs each
    // row's OWN pattern only. Two shapes were tried and rejected:
    // per-pattern filters over `fetched` get pushed below their
    // semi-joins (every pattern over the whole candidate UNION), and
    // a guarded OR-of-ANDs has its one-sided rlike disjunction
    // EXTRACTED and pushed below the join by Catalyst's
    // extra-predicate machinery — same union-wide evaluation through
    // the back door. CaseWhen is not subject to that extraction and
    // codegen evaluates exactly the matching branch, so total regex
    // work stays at sum over patterns of |candidates(pattern)|
    // (PlanAuditSpec pins the shape).
    val confirm = patterns.zipWithIndex.foldLeft(lit(false)) {
      case (acc, (p, pid)) =>
        when(col("pattern_id") === pid.toLong,
          col("__text").rlike(p)).otherwise(acc)
    }
    fetched.join(cands, Seq("doc_id"))
      .filter(confirm)
      .select(col("pattern_id"), col("doc_id"))
      .orderBy("pattern_id", "doc_id")
  }

  /** CONJUNCTIVE regex search — every pattern must match the same doc
    * (the reference's own `/search` semantics: its value-regex list is
    * conjunctive, `search.clj:74-81` — every compiled pattern must
    * re-find). The index serves this BETTER than the single-pattern
    * form: candidate sets INTERSECT, so each analyzable pattern only
    * shrinks the fetch, and — the asymmetry worth stating — an
    * UNANALYZABLE member is gracefully tolerated here: in a
    * conjunction it can only remove matches, never add them, so the
    * other members' candidates remain a sound superset and the
    * unindexable pattern just rides the confirm. (The batched UNION
    * form has the opposite contract: one unanalyzable member poisons
    * the sweep and raises.) Only when NO member is analyzable is there
    * nothing to nominate from — loud refusal unless `allowScan`. */
  def searchAllFromIndex(spark: SparkSession, table: String,
      docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], allowScan: Boolean = false): DataFrame = {
    require(patterns.nonEmpty, "patterns must be non-empty")
    val candSets = patterns.flatMap(p =>
      candidatesFromIndex(spark, table, p))
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    val fetched =
      if (candSets.isEmpty) {
        require(allowScan,
          s"no pattern of ${patterns.mkString("[", ", ", "]")} has a " +
            "required literal factor >= 3 chars within ASCII — the " +
            "conjunction cannot nominate; pass allowScan = true to " +
            "pay the full corpus scan explicitly")
        base
      } else {
        val cands = candSets.reduce((a, b) =>
          a.join(b, Seq("doc_id"), "left_semi"))
        // The searchFromIndex barrier, for the same reason — and the
        // same unforced join (the intersected candidate set is the
        // SMALLEST frame here, but nothing bounds it by contract).
        graft.ops.Materialize.barrier(
          base.join(cands, Seq("doc_id"), "left_semi"))
      }
    patterns.foldLeft(fetched)((df, p) =>
        df.filter(col("__text").rlike(p)))
      .select("doc_id").orderBy("doc_id")
  }

  /** DuckDB oracle for [[searchAllFromIndex]]: ANDed regexp_matches. */
  def conjunctiveOracleSql(patterns: Seq[String],
      corpusSql: String = "documents"): String = {
    val conj = patterns.map(p =>
      s"regexp_matches(text, '${p.replace("'", "''")}')").mkString(" AND ")
    s"""SELECT doc_id FROM $corpusSql
       |WHERE $conj
       |ORDER BY doc_id""".stripMargin
  }

  /** Index-targeted SCRUB — the rewrite consumer of the sidecar: every
    * doc flows through, but the regex (and its replacement machinery)
    * evaluates ONLY on nominated docs; non-candidates pass through
    * byte-identical without ever being matched against. Sound by the
    * superset theorem: a non-candidate cannot contain a match, so
    * skipping it IS the identity the full-scan scrub would compute.
    * This is the PII/takedown rewrite shape at corpus scale — the
    * full-scan `regexp_replace` pays the regex on every doc when the
    * hits are one-in-a-million. The nomination flag arrives via a
    * broadcast left join and the replace sits in a CaseWhen, so
    * per-row work is one boolean check on the cold path. Unanalyzable
    * patterns refuse loudly unless `allowScan` (then the full-scan
    * scrub runs, stated). Returns (doc_id, text) for EVERY input doc,
    * ordered. */
  def scrubFromIndex(spark: SparkSession, table: String,
      docs: DataFrame, idCol: String, textCol: String, pattern: String,
      replacement: String, allowScan: Boolean = false): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    candidatesFromIndex(spark, table, pattern) match {
      case Some(cands) =>
        base.join(cands.withColumn("__hit", lit(true)),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("__hit"),
              regexp_replace(col("__text"), pattern, replacement))
              .otherwise(col("__text")).as("text"))
          .orderBy("doc_id")
      case None =>
        require(allowScan,
          s"regex '$pattern' has no required literal factor >= 3 chars " +
            "within ASCII (or no gram selective under the configured " +
            "spark.graft.regexMaxGramDf) — the scrub cannot target; pass " +
            "allowScan = true to pay the full-corpus rewrite explicitly")
        base.select(col("doc_id"),
            regexp_replace(col("__text"), pattern, replacement).as("text"))
          .orderBy("doc_id")
    }
  }

  /** DuckDB oracle for [[scrubFromIndex]]: the global replace over
    * every doc — equality proves the skipped non-candidates truly had
    * nothing to replace. */
  def scrubOracleSql(pattern: String, replacement: String,
      corpusSql: String = "documents"): String = {
    val p = pattern.replace("'", "''")
    val r = replacement.replace("'", "''")
    s"""SELECT doc_id, regexp_replace(text, '$p', '$r', 'g') AS text
       |FROM $corpusSql
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // Doc store: the codesearch deployment shape (index nominates, store
  // serves the bytes).
  // -------------------------------------------------------------------

  /** Write the doc STORE next to the index: (doc_id, text, src)
    * bucketed + SORTED by doc_id. [[searchFromIndex]]'s confirm over
    * an arbitrary corpus frame reads every text byte (the semi-join
    * cannot prune a scan) — the one corpus-shaped term left in the
    * probe. Against this store, [[searchFromStore]] turns the
    * candidate set into a LITERAL doc_id predicate, which reaches the
    * parquet footers: sorted-by-doc_id row groups prune to the
    * candidates' ranges and the fetch is candidate-sized, completing
    * the codesearch pair (index + content store). */
  def writeDocStore(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    CorpusWriter.dropOrphanedLocation(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_srcs")
    CorpusWriter.dropOrphanedLocation(spark, s"${table}_meta")
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"), lit(null).cast("string").as("src"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(table)
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_meta")
  }

  /** Land another doc batch into the store (disjoint-batch contract,
    * `src`-guarded replays like every landing). */
  def appendToDocStore(docs: DataFrame, idCol: String, textCol: String,
      table: String, src: String): Unit = {
    val spark = docs.sparkSession
    val tag = CorpusWriter.landTag(src)
    if (CorpusWriter.srcApplied(spark, table, tag)) return
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"), lit(tag).cast("string").as("src"))
      .write.mode(SaveMode.Append)
      .bucketBy(metaBuckets(spark, table), "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(table)
    CorpusWriter.recordSrc(spark, table, tag)
  }

  /** Compact the store: each landing appends one file set per bucket,
    * so after many landings a fetch opens O(landings) files per
    * bucket. One rewrite under the store's bucket spec restores one
    * file set; rows are untouched (the store has no refcounts to
    * fold), so it is answer-invisible by construction. Records any
    * live src tags first so replays stay recognized. */
  def compactDocStore(spark: SparkSession, table: String): Unit = {
    CorpusWriter.recordSrcs(spark, table)
    CorpusWriter.compactSrcs(spark, table)
    CorpusWriter.rewriteBucketed(spark, table)(df =>
      df.select(col("doc_id"), col("text"),
        lit(null).cast("string").as("src")))
  }

  /** Reclaim retired docs' storage: one anti-join rewrite under the
    * store's bucket spec. NOT on the serving path's latency budget —
    * a doc retired from the INDEX is never nominated, so its store row
    * is unreachable garbage from the index retire's commit on; this
    * rewrite is the storage-reclaim op, schedulable like compaction. */
  def retireFromDocStore(spark: SparkSession, table: String,
      retired: DataFrame, idCol: String): Unit = {
    // Record any in-row src tags BEFORE the anti-join rewrite (ADVICE
    // r20, mirroring compactDocStore): if a landing committed store
    // rows but crashed before recordSrc, and all of that landing's
    // docs are retired here, the rewrite would otherwise erase the
    // only replay marker and a replay would re-append duplicates.
    CorpusWriter.recordSrcs(spark, table)
    val ids = retired.select(col(idCol).cast("long").as("doc_id"))
    CorpusWriter.rewriteBucketed(spark, table)(
      _.join(ids, Seq("doc_id"), "left_anti"))
  }

  /** Regex search served by the index + store PAIR: candidates
    * nominate from the trigram sidecar, their ids collect under a loud
    * bound (`maxCandidates` — a probe whose nomination exceeds it is a
    * scan in disguise and must say so), and the store fetch runs as a
    * LITERAL doc_id predicate the parquet reader prunes by (sorted row
    * groups → candidate-sized IO, no join at all). The literal path is
    * capped at `maxLiteralIds` — a ten-thousand-literal In expression
    * costs more to PLAN than it saves to scan (measured: tens of
    * seconds at 30k literals) — beyond it the fetch degrades
    * gracefully to a broadcast semi-join against the bucketed store
    * (no store shuffle, no footer pruning; the width already says the
    * pattern is weakly indexed here). The confirm `rlike` then runs on
    * the fetched rows. Unanalyzable patterns raise — there is no
    * corpus frame here to scan. */
  def searchFromStore(spark: SparkSession, idxTable: String,
      storeTable: String, pattern: String,
      maxCandidates: Int = 100000, maxLiteralIds: Int = 1000): DataFrame = {
    // The literal-predicate path must not bypass the loud scan-in-
    // disguise bound (ADVICE r20): a caller passing maxLiteralIds ≥
    // maxCandidates would fetch an unbounded id list as "literals".
    require(maxLiteralIds <= maxCandidates,
      s"maxLiteralIds ($maxLiteralIds) must not exceed maxCandidates " +
        s"($maxCandidates) — the literal path would bypass the bound")
    val cands = candidatesFromIndex(spark, idxTable, pattern)
    require(cands.isDefined,
      s"regex '$pattern' has no required literal factor >= 3 chars " +
        "within ASCII (or no gram selective under the configured " +
        "spark.graft.regexMaxGramDf) — the store path cannot nominate; " +
        "scan a corpus frame via searchFromIndex(allowScan = true) instead")
    val bounded = graft.ops.Materialize.barrier(cands.get)
    val ids = bounded.limit(maxLiteralIds + 1).collect().map(_.getLong(0))
    val fetched =
      if (ids.length <= maxLiteralIds)
        spark.table(storeTable)
          .filter(col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*))
      else {
        val n = bounded.limit(maxCandidates + 1).count()
        require(n <= maxCandidates,
          s"regex '$pattern' nominates more than $maxCandidates docs — " +
            "a fetch at that width is a scan in disguise; raise " +
            "maxCandidates deliberately or run searchFromIndex over the corpus")
        // Same load-bearing barrier as searchFromIndex: without it the
        // rlike pushes below the semi-join and back to a full scan.
        graft.ops.Materialize.barrier(
          spark.table(storeTable)
            .join(broadcast(bounded), Seq("doc_id"), "left_semi"))
      }
    fetched
      .filter(col("text").rlike(pattern))
      .select("doc_id").orderBy("doc_id")
  }

  /** DuckDB oracle: the same unanchored-contains semantics
    * (`regexp_matches`) over the corpus — the oracle scans text, so a
    * green gate proves the index-nominated path loses nothing. */
  def oracleSql(pattern: String, corpusSql: String = "documents"): String = {
    val esc = pattern.replace("'", "''")
    s"""SELECT doc_id FROM $corpusSql
       |WHERE regexp_matches(text, '$esc')
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for [[searchManyFromIndex]]: one UNION ALL branch
    * per pattern, each the single-pattern oracle with its id. */
  def batchOracleSql(patterns: Seq[String],
      corpusSql: String = "documents"): String = {
    val branches = patterns.zipWithIndex.map { case (p, i) =>
      val esc = p.replace("'", "''")
      s"""SELECT CAST($i AS BIGINT) AS pattern_id, doc_id FROM $corpusSql
         |WHERE regexp_matches(text, '$esc')""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$branches\nORDER BY pattern_id, doc_id"
  }
}
