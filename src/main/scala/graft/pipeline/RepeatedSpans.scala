package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-substring span detection — the exact-substring-dedup report
  * (the Lee et al. 2021 "Deduplicating Training Data Makes Language
  * Models Better" shape, re-expressed over word windows): find every
  * maximal token span of a document whose constituent `window`-token
  * substrings each occur in at least `minDocs` DISTINCT documents, and
  * report it as a removal span `(start_tok, end_tok)`. This is finer
  * than passage dedup ([[Passages.dedupPassages]]): chunking at fixed
  * boundaries misses a duplicated run that straddles a chunk edge,
  * while overlapping windows at stride 1 localize the repeated run
  * exactly, so the downstream rewrite can cut the quote and keep the
  * page.
  *
  * Scale shape: windows cross the plan as 63-bit FINGERPRINTS
  * ([[graft.functions.WordGramHashesExpr]], codegen'd scan-side) — one
  * long per token position, never the window strings. The frequency
  * pass shuffles `(fp, doc_id)` once; the matched-window semi-join
  * output is only the corpus-REPEATED windows (boilerplate and quotes,
  * a small fraction of corpus tokens at a sane `window`), so the
  * span-merge window function runs over that small frame, partitioned
  * by document — never a corpus-wide window. Like
  * [[Passages.dedupPassages]], the exploded frame is deliberately NOT
  * cache-barriered: both consumers re-derive it from the codegen'd
  * scan (two cheap passes) rather than materializing a
  * corpus-token-scale cache.
  *
  * Within-doc-only repetition does NOT flag (the frequency gate counts
  * distinct documents): the cross-document notion is the dedup one —
  * within-doc repetition is a quality signal and already scored by
  * [[TextStats.repetitionStats]] (q46).
  */
object RepeatedSpans {

  /** (doc_id, start_tok, end_tok, n_windows) for every maximal span of
    * corpus-repeated `window`-token substrings; token indices are
    * 0-based positions into the lowercased whitespace tokenization
    * (the [[graft.functions.WordGramsExpr]] walk). Two matched windows
    * merge into one span when their coverage overlaps or is adjacent
    * (start gap ≤ `window`). Documents with no repeated window are
    * absent — a removal-span report, not a corpus rewrite. */
  def spans(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minDocs: Int = 2): DataFrame =
    // The ordered REPORT form; the trailing sort is presentation only.
    spansUnordered(docs, idCol, textCol, window, minDocs)
      .orderBy("doc_id", "start_tok")

  /** [[spans]] without the final listing sort — the form internal
    * consumers aggregate from ([[scrub]]'s collect_list is
    * order-sensitive to Catalyst, so EliminateSorts cannot drop an
    * upstream orderBy itself: at the 64× probe the wasted range
    * exchange + sort of the corpus-sized span table was measurable). */
  private[graft] def spansUnordered(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minDocs: Int = 2): DataFrame = {
    require(window > 0 && minDocs > 1,
      s"need window > 0 and minDocs > 1: $window, $minDocs")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // posexplode_OUTER + isnotnull (r22, the InferFiltersFromGenerate
    // duplication — see Winnow.decontam): a non-outer generate over the
    // derived gram-hash array pushes a size/isnotnull filter below the
    // projection that re-evaluates word_gram_hashes per row; the outer
    // form takes no inferred filter and the isnotnull on the GENERATED
    // column restores the identical row set (gram hashes are non-null
    // by construction).
    val wins = docs.select(col(idCol).as("doc_id"),
        posexplode_outer(graft.functions.GraftFunctions.wordGramHashes(
          col(textCol), window)).as(Seq("pos", "fp")))
      .filter(col("fp").isNotNull)
    // minDocs == 2 (the dedup default): "≥ 2 distinct docs" ⟺
    // min(doc_id) ≠ max(doc_id) — one partial-aggregated exchange where
    // countDistinct plans a two-phase distinct expansion (guide §2.3:
    // aggregate before you shuffle). Groups whose doc_ids are all equal
    // (or all null — min=max=null, filter null → dropped) fail both
    // forms identically.
    val hot =
      if (minDocs == 2)
        wins.groupBy("fp")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("fp")
      else wins.groupBy("fp")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= minDocs)
        .select("fp")
    val matched = wins.join(hot, Seq("fp"), "left_semi")
    // Span merge: windows sorted by position within a doc chain into one
    // span while each start is within `window` of the previous (coverage
    // [p, p+window-1] overlapping or adjacent). Runs over matched rows
    // only, partitioned by doc — small and parallel by construction.
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    matched
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) > window, 1).otherwise(0))
      .withColumn("span_id", sum("brk").over(byDoc))
      .groupBy("doc_id", "span_id")
      .agg(min("pos").as("start_tok"),
        (max("pos") + lit(window - 1)).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "start_tok", "end_tok", "n_windows")
  }

  /** Rewrite the corpus with the repeated spans REMOVED — the "apply"
    * side of [[spans]], the way [[DupClusters.canonicalize]] applies
    * q37's clusters: every document's tokens outside any repeated span
    * are rejoined with single spaces (whitespace normalized, original
    * case kept — span positions index token BOUNDARIES, which lowercasing
    * never moves), and the removal is reported as a token count. Docs
    * with no repeated span pass through (normalized) with n_removed = 0.
    *
    * Scale shape: the span table is GRAPH-sized (docs with corpus-
    * repeated runs × few spans each), so its per-doc collect_list
    * aggregate is small and the corpus join is AQE-broadcast-eligible
    * with no static hint (the q43 discipline); the cut itself is one
    * codegen'd higher-order filter per row — the corpus text is scanned,
    * rewritten map-side, and never shuffles. */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minDocs: Int = 2): DataFrame = {
    val sp = spansUnordered(docs, idCol, textCol, window, minDocs)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("sp"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(sp, Seq("doc_id"), "left")
      .withColumn("toks", regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
      .withColumn("kept", when(col("sp").isNull, col("toks"))
        .otherwise(filter(col("toks"), (_, i) =>
          !exists(col("sp"), s =>
            i >= s.getField("start_tok") && i <= s.getField("end_tok")))))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /** Mersenne field for the doubling combine: fp values reduce into
    * [0, 2^61), so `fp·2 + fp' < 2^63` — no overflow under ANSI mode
    * in either engine, and the modular arithmetic replays exactly. */
  private val FieldP: Long = (1L << 61) - 1

  /** WHOLE-span verified repeats via prefix doubling (the stretch form
    * of [[spans]], VERDICT r16 #7 — Lee et al. ACL'22's exact-substring
    * notion at power-of-two bracket precision): [[spans]] marks every
    * position covered by a corpus-repeated `window`-token substring,
    * but a merged span can be a CHIMERA — window 1 shared with doc B,
    * window 2 with doc C, the whole never repeating anywhere. This op
    * verifies wholeness: level i carries one fingerprint per position
    * covering `window·2^i` tokens (combine of level i−1 at pos and
    * pos + len — the suffix-array doubling trick, fingerprinted), and
    * a position "repeats at len" only when its WHOLE-len fingerprint
    * occurs in ≥ `minDocs` distinct documents. Reports per doc the
    * longest verified whole-repeat bracket and how many positions
    * reach it.
    *
    * Scale shape: level 0 is the one codegen'd window-hash scan
    * (cached — every level derives from it); each doubling is one
    * slim (doc_id, pos, fp) self-join on (doc_id, pos+len) — rows
    * SHRINK per level (pos ≤ n_toks − len) and levels are
    * `doublings` ≤ 6 by contract; each level's repeat gate is one
    * fp-keyed count aggregate. Nothing quadratic: positions pair only
    * with their own doc's offset partner. */
  def wholeRepeats(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minDocs: Int = 2, doublings: Int = 3): DataFrame = {
    require(window > 0 && minDocs > 1,
      s"need window > 0 and minDocs > 1: $window, $minDocs")
    require(doublings >= 0 && doublings <= 6,
      s"doublings is a contract-bounded loop: $doublings")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // Doubling as a WINDOW chain, not per-level self-joins (r22):
    // posexplode emits DENSE positions 0..m−1 per doc and no level ever
    // drops a row (levels only narrow which positions carry a non-null
    // fingerprint), so the combine partner fp_{i−1}(pos + half) is
    // exactly lead(fp_{i−1}, half) over (doc_id, pos) — null past the
    // end, and null propagates through the modular combine precisely
    // where the join form dropped the row. Every level shares ONE
    // partitioning+ordering, so the whole chain runs over a single
    // exchange + sort (guide §2.4: windows keyed like a preceding
    // shuffle need no second one) where the join form paid a shuffle
    // per level; r21's per-level eager-barrier count jobs (the VERDICT
    // r21 #3/#5 fixture tax, one job per level) collapse to ONE barrier
    // on the all-levels frame — still eager, because the (doublings+1)
    // repeat gates and mark semi-joins below all race it inside the one
    // final union job.
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    var frame = docs.select(col(idCol).as("doc_id"),
        posexplode_outer(graft.functions.GraftFunctions.wordGramHashes(
          col(textCol), window)).as(Seq("pos", "fp")))
      .filter(col("fp").isNotNull)
      .withColumn("fp0", col("fp") % lit(FieldP))
      .drop("fp")
    var len = window
    for (i <- 1 to doublings) {
      val half = len
      frame = frame.withColumn(s"fp$i",
        (col(s"fp${i - 1}") * lit(2L) +
          lead(col(s"fp${i - 1}"), half).over(byDoc)) % lit(FieldP))
      len = len * 2
    }
    val levels = graft.ops.Materialize.barrier(frame)
    // All levels gate through ONE aggregate and ONE semi-join: the wide
    // frame explodes to slim (doc_id, pos, len, fp) rows (len encodes
    // the level bijectively), the repeat gate is a single
    // (len, fp)-keyed aggregate, and the mark set is one semi-join —
    // where the per-level formulation ran (doublings+1) aggregate scans
    // and (doublings+1) semi-joins over the cache, all racing for the
    // same task slots in the final job.
    val lvlStructs = (0 to doublings).map { i =>
      struct(lit(window * (1 << i)).as("len"), col(s"fp$i").as("fp"))
    }
    val exploded = levels.select(col("doc_id"), col("pos"),
        explode(array(lvlStructs: _*)).as("lf"))
      .filter(col("lf.fp").isNotNull)
      .select(col("doc_id"), col("pos"),
        col("lf.len").as("len"), col("lf.fp").as("fp"))
    // Same minDocs == 2 gate collapse as [[spansUnordered]]: min ≠ max
    // replaces the two-phase countDistinct (guide §2.3).
    val rep =
      if (minDocs == 2)
        exploded.groupBy("len", "fp")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("len", "fp")
      else exploded.groupBy("len", "fp")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= minDocs)
        .select("len", "fp")
    val marks = Seq(exploded.join(rep, Seq("len", "fp"), "left_semi")
      .select(col("doc_id"), col("pos"), col("len")))
    // Measured trade, recorded so nobody "optimizes" this back: the
    // monotone prune (double from the MARKED positions only — correct,
    // since a repeated 2·len span forces both len halves repeated under
    // the fp-equality convention) was built and measured REGRESSING on
    // the 64× adversarial probe (67–72 s → 105–133 s): with 63 true
    // near-dups per doc nearly every window repeats, so the prune keeps
    // everything and only adds one cached semi-join shuffle per level.
    // On dup-light corpora the frontier after level 0 is boilerplate-
    // sized and the prune would win; a deployment that knows its dup
    // profile can reintroduce it by feeding `marks`' semi-join into the
    // next level.
    val perPos = marks.reduce(_ unionAll _)
      .groupBy("doc_id", "pos").agg(max("len").as("plen"))
    // Per-doc max as a whole-partition WINDOW over perPos, not a
    // docMax-aggregate + self-join (r22 second wave): perPos is not
    // materialized, so the join form re-executed the ENTIRE
    // explode → repeat-gate → semi-join chain for its second consumer —
    // the 64× profile showed the chain's 1.15 GB and 204 MB exchanges
    // each written TWICE, byte-identical (the two consumers' differing
    // projections defeat ReusedExchange — the r7 Decontam defect
    // class). The window runs over the single perPos output (one
    // doc_id-keyed exchange of the marked-position rows), and the
    // final count groups on (doc_id, max_len) under the same
    // clustering — the chain now executes exactly once.
    perPos
      .withColumn("max_len",
        max("plen").over(Window.partitionBy("doc_id")))
      .filter(col("plen") === col("max_len"))
      .groupBy("doc_id", "max_len")
      .agg(count(lit(1)).as("n_pos"))
      .select("doc_id", "max_len", "n_pos")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[wholeRepeats]]: the same window-hash base
    * reduced into the Mersenne field, `doublings` unrolled combine
    * levels, per-level distinct-doc gates, and the per-pos/per-doc max
    * fold. */
  def wholeRepeatsOracleSql(window: Int, minDocs: Int,
      doublings: Int): String = {
    val levels = (1 to doublings).map { i =>
      val half = window * (1 << (i - 1))
      s"""b$i AS (
         |  SELECT a.doc_id, a.pos, (a.fp * 2 + b.fp) % $FieldP AS fp
         |  FROM b${i - 1} a JOIN b${i - 1} b
         |    ON b.doc_id = a.doc_id AND b.pos = a.pos + $half)""".stripMargin
    }
    val marks = (0 to doublings).map { i =>
      val len = window * (1 << i)
      s"""SELECT w.doc_id, w.pos, $len AS len FROM b$i w
         |  WHERE w.fp IN (SELECT fp FROM b$i GROUP BY fp
         |                 HAVING count(DISTINCT doc_id) >= $minDocs)""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |b0 AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ${graft.oracle.Duck.gramHash63Sql("g")} % $FieldP AS fp
       |  FROM (
       |    SELECT doc_id,
       |      unnest(range(1, greatest(len(t) - ${window - 1}, 0) + 1)) AS i,
       |      unnest(list_transform(range(1, greatest(len(t) - ${window - 1}, 0) + 1),
       |        __wi -> array_to_string(t[__wi:__wi+${window - 1}], ' '))) AS g
       |    FROM toks)),
       |${levels.mkString(",\n")},
       |mk AS (
       |  $marks),
       |pp AS (SELECT doc_id, pos, max(len) AS plen FROM mk GROUP BY 1, 2),
       |dm AS (SELECT doc_id, max(plen) AS max_len FROM pp GROUP BY 1)
       |SELECT pp.doc_id AS doc_id, CAST(dm.max_len AS INTEGER) AS max_len,
       |  count(*) AS n_pos
       |FROM pp JOIN dm ON dm.doc_id = pp.doc_id AND pp.plen = dm.max_len
       |GROUP BY 1, 2 ORDER BY pp.doc_id""".stripMargin
  }

  /** The span-derivation CTE chain shared by [[oracleSql]] and
    * [[scrubOracleSql]]: leaves `spr` = the q69 result rows. */
  private def spansCtes(window: Int, minDocs: Int): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ${graft.oracle.Duck.gramHash63Sql("g")} AS fp
       |  FROM (
       |    SELECT doc_id,
       |      unnest(range(1, greatest(len(t) - ${window - 1}, 0) + 1)) AS i,
       |      unnest(list_transform(range(1, greatest(len(t) - ${window - 1}, 0) + 1),
       |        __wi -> array_to_string(t[__wi:__wi+${window - 1}], ' '))) AS g
       |    FROM toks)),
       |hot AS (SELECT fp FROM wins GROUP BY fp
       |        HAVING count(DISTINCT doc_id) >= $minDocs),
       |m AS (SELECT w.doc_id, w.pos FROM wins w JOIN hot USING (fp)),
       |g AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |           > $window THEN 1 ELSE 0 END AS brk
       |  FROM m),
       |sp AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |  FROM g),
       |spr AS (
       |  SELECT doc_id, MIN(pos) AS start_tok,
       |       CAST(MAX(pos) + ${window - 1} AS INTEGER) AS end_tok,
       |       COUNT(*) AS n_windows
       |  FROM sp GROUP BY doc_id, span_id)""".stripMargin

  /** DuckDB oracle for [[spans]] over table `documents`: window strings
    * built by slicing the same lowercased tokenization, folded through
    * the SAME 63-bit byte hash the native expression computes
    * ([[graft.oracle.Duck.gramHash63Sql]]), then the same
    * lag/sum/group span merge as a window-function chain. */
  def oracleSql(window: Int, minDocs: Int): String =
    s"""WITH ${spansCtes(window, minDocs)}
       |SELECT doc_id, start_tok, end_tok, n_windows
       |FROM spr ORDER BY doc_id, start_tok""".stripMargin

  /** DuckDB oracle for [[scrub]] over table `documents`: the same span
    * chain, collected per doc, applied with the same 0-based
    * position-in-span cut (DuckDB lambdas index 1-based, hence i-1)
    * over the ORIGINAL-case tokens. */
  def scrubOracleSql(window: Int, minDocs: Int): String =
    s"""WITH ${spansCtes(window, minDocs)},
       |spa AS (
       |  SELECT doc_id, list((start_tok, end_tok)) AS sp
       |  FROM spr GROUP BY doc_id),
       |cut AS (
       |  SELECT d.doc_id,
       |    regexp_extract_all(d.text, '\\S+') AS ot,
       |    CASE WHEN spa.sp IS NULL THEN regexp_extract_all(d.text, '\\S+')
       |         ELSE list_filter(regexp_extract_all(d.text, '\\S+'),
       |           (x, i) -> NOT list_bool_or(list_transform(spa.sp,
       |             s -> i - 1 >= s[1] AND i - 1 <= s[2])))
       |    END AS kept
       |  FROM documents d LEFT JOIN spa ON d.doc_id = spa.doc_id)
       |-- array_to_string of an EMPTY list is NULL in DuckDB where
       |-- Spark's array_join gives '' — a fully-scrubbed doc must
       |-- compare as the empty string in both engines.
       |SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS text,
       |       CAST(len(ot) - len(kept) AS BIGINT) AS n_removed
       |FROM cut ORDER BY doc_id""".stripMargin
}
