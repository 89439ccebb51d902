package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (round 15) — Schleimer, Wilkerson &
  * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"
  * (SIGMOD 2003; the MOSS algorithm). Completes the fingerprint family
  * from the SPARSE-SELECTION side: q21/q25 fingerprint whole documents,
  * q106 indexes every gram — winnowing keeps only each w-window's
  * MINIMUM gram hash, a ~2/(w+1) density subset with a hard guarantee:
  * any shared token run of at least w + n − 1 tokens shares at least
  * one SELECTED fingerprint (every length-w window inside the run is
  * window-min'd on both sides, and equal windows pick equal minima).
  * That is the detection bar MinHash cannot state: LSH recall is
  * probabilistic in whole-document similarity; winnowing recall is
  * exact in match LENGTH.
  *
  * Scale shape: selection is per-row array work on the native 63-bit
  * gram-hash array ([[graft.functions.WordGramHashesExpr]]) — a
  * `transform(sequence, array_min(slice))` chain, no shuffle, no UDF;
  * what crosses the wire afterwards is the ~2/(w+1)-dense distinct
  * fingerprint set, never grams or text. The pair report groups by
  * selected fingerprint and emits pairs ARRAY-SIDE from each
  * fingerprint's sorted doc set (the q58 emission), so a fingerprint
  * with k sharers costs k(k−1)/2 output rows, not a k² join blow-up —
  * and fingerprints shared by more than `maxDf` docs are EXCLUDED, the
  * published MOSS move (its "ignore fingerprints in more than N
  * documents" option): past that breadth a fingerprint is boilerplate,
  * evidence of nothing, and the drop is the documented recall contract
  * (mirrors [[MinHashDedup.MaxKeyDf]]).
  */
object Winnow {

  /** MOSS's boilerplate bar: selected fingerprints shared by more than
    * this many documents are excluded from pair evidence. */
  val MaxDf: Int = 64

  /** The winnowed selection over a gram-hash array column named
    * `__wf`: distinct window minima. Documents with fewer than `w`
    * grams contribute their single global minimum (the degenerate
    * one-window read of the definition); gram-less documents select
    * nothing. */
  private def selectedOver(w: Int): Column = expr(
    s"""CASE
       |  WHEN size(__wf) = 0 THEN CAST(array() AS ARRAY<BIGINT>)
       |  WHEN size(__wf) <= $w THEN array(array_min(__wf))
       |  ELSE array_distinct(transform(
       |    sequence(1, size(__wf) - $w + 1),
       |    __wi -> array_min(slice(__wf, __wi, $w))))
       |END""".stripMargin)

  /** `(doc_id, n_grams, sel)` — id, gram count, winnowed selection. */
  private def withSelection(docs: DataFrame, idCol: String,
      textCol: String, n: Int, w: Int): DataFrame = {
    require(n > 0 && w > 0, s"need positive n/w, got n=$n w=$w")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.GraftFunctions.wordGramHashes(
          col(textCol), n).as("__wf"))
      .select(col("doc_id"), size(col("__wf")).cast("long").as("n_grams"),
        selectedOver(w).as("sel"))
  }

  /** Per-document selection report: gram count, selected count, and the
    * xor-fold of the selected set (an order-free 64-bit witness of the
    * exact fingerprint SET, so the oracle checks the selection itself,
    * not just its size). */
  def report(docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int): DataFrame =
    withSelection(docs, idCol, textCol, n, w)
      .select(col("doc_id"), col("n_grams"),
        size(col("sel")).cast("long").as("n_selected"),
        expr("aggregate(sel, CAST(0 AS BIGINT), (__wa, __wx) -> __wa ^ __wx)")
          .as("fp_xor"))
      .orderBy("doc_id")

  /** Shared-fingerprint candidate pairs — the MOSS report: documents
    * sharing at least `minShared` selected fingerprints, with the
    * shared count as match-mass evidence. Guarantee inherited from
    * selection: a shared token run of ≥ w + n − 1 tokens forces ≥ 1
    * shared selected fingerprint (unless that fingerprint is
    * boilerplate past [[MaxDf]], the documented exclusion). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int, minShared: Int, maxDf: Int = MaxDf): DataFrame = {
    require(minShared > 0, s"minShared must be positive: $minShared")
    require(maxDf > 1, s"maxDf must exceed 1: $maxDf")
    val fps = withSelection(docs, idCol, textCol, n, w)
      .select(col("doc_id"), explode_outer(col("sel")).as("fp"))
      .filter(col("fp").isNotNull)
    val cells = fps.groupBy("fp")
      .agg(array_sort(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
    cells
      .select(explode(expr(
        "flatten(transform(ds, (__pa, __pi) -> " +
          "transform(slice(ds, __pi + 2, size(ds)), " +
          "__pb -> struct(__pa AS doc_a, __pb AS doc_b))))")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** The corpus's selected fingerprints, one `fp` row per (doc,
    * selected fingerprint) — the frame [[CorpusWriter.writeWinnowIndex]]
    * distincts and lands. */
  private[pipeline] def selectedFps(docs: DataFrame, idCol: String,
      textCol: String, n: Int, w: Int): DataFrame =
    withSelection(docs, idCol, textCol, n, w)
      .select(explode_outer(col("sel")).as("fp"))
      .filter(col("fp").isNotNull)

  /** Broadcast-contract bound on distinct eval-side SELECTED
    * fingerprints (the [[graft.pipeline.Decontam.DefaultMaxEvalGrams]]
    * rationale at winnow density — the eval side is winnowed too, so
    * a benchmark suite that fits the q42 bound fits this one ~(w+1)/2×
    * over). */
  val DefaultMaxEvalFps: Long = 50L * 1000 * 1000

  /** Winnow-grain benchmark decontamination — q42's question posed at
    * the MOSS selection density: flag every non-eval document sharing
    * at least one SELECTED fingerprint with the eval slice. The
    * guarantee is inherited from winnowing BOTH sides under the same
    * (n, w): any eval↔corpus shared token run of ≥ w + n − 1 tokens
    * contains a full w-window of identical gram hashes, whose minimum
    * is selected on both sides — so contamination of at least that run
    * length CANNOT slip through, while the probe pays ~2/(w+1) of
    * q42's per-gram work. w is the knob between q42 (w=1 degenerates
    * to every gram) and cheaper/coarser sweeps: raise w, pay less,
    * accept a longer minimum detected run.
    *
    * Scale shape is [[Decontam.overlapReport]]'s verbatim: the eval
    * selection broadcasts under an ENFORCED count contract (loud error,
    * not a silent shuffle-join degrade), the corpus side selects
    * map-side (per-row array work, no shuffle of text or grams) and
    * probes the broadcast; the one exchange carries matched
    * `(doc_id, fp)` pairs only. No [[MaxDf]] bar here: a fingerprint
    * that is boilerplate corpus-wide is still contamination evidence
    * when the eval set contains it. */
  def decontam(docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column, n: Int, w: Int,
      maxEvalFps: Long = DefaultMaxEvalFps): DataFrame = {
    // explode_OUTER + isnotnull, not plain explode (r22, guide §4.4's
    // duplicated-evaluation trap in Catalyst form): a non-outer Generate
    // over a derived array makes InferFiltersFromGenerate push a
    // `size(sel) > 0 AND isnotnull(sel)` filter below the projection,
    // INLINING the whole winnow-selection expression (gram hashing
    // included) into the filter — the selection was measured computing
    // twice per corpus row (two ~1.05 s single-task stages at sf0.1 for
    // one pass's worth of work each). The outer generate takes no
    // inferred filter; empty selections emit one null fp that the
    // isnotnull (evaluated on the GENERATED column, above the Generate)
    // removes — the identical row set.
    val evalFps = graft.ops.Materialize.register(
      withSelection(docs.filter(evalPred), idCol, textCol, n, w)
        .select(explode_outer(col("sel")).as("fp"))
        .filter(col("fp").isNotNull)
        .distinct())
    val nEval = evalFps.count()
    if (nEval > maxEvalFps) {
      graft.ops.Materialize.release(Seq(evalFps))
      throw new IllegalArgumentException(
        s"requirement failed: winnow decontam eval side has $nEval " +
          s"distinct selected fingerprints, over the broadcast contract " +
          s"bound $maxEvalFps: evalPred must select a held-out eval set, " +
          "not a corpus slice — see Decontam.overlapReport's contract")
    }
    withSelection(docs.filter(!evalPred), idCol, textCol, n, w)
      .select(col("doc_id"), size(col("sel")).cast("long").as("n_selected"),
        explode_outer(col("sel")).as("fp"))
      .filter(col("fp").isNotNull)
      .join(broadcast(evalFps), "fp")
      .groupBy("doc_id", "n_selected")
      .agg(count(lit(1)).as("n_hit"))
      .select("doc_id", "n_selected", "n_hit")
      .orderBy("doc_id")
  }

  /** Increment admission against a STORED winnow-fingerprint index
    * ([[CorpusWriter.writeWinnowIndex]] — the standing corpus's
    * selected-fp set, bucketed by `fp`): per increment document its
    * selected count and how many of those fingerprints the corpus
    * already contains — the near-dup admission meter at winnow grain,
    * with the guarantee bar (an increment doc repeating ≥ w + n − 1
    * corpus tokens MUST show n_seen ≥ 1). The steady-state deployment
    * form: the corpus contributes one bucketed exchange-free index
    * scan, no re-tokenize, cost is increment-sized. */
  def admitAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, increment: DataFrame, idCol: String,
      textCol: String, n: Int, w: Int): DataFrame = {
    val meta = spark.table(s"${table}_meta").collect()
    require(meta.length == 1 && meta(0).getAs[Int]("n") == n &&
      meta(0).getAs[Int]("w") == w,
      s"winnow index $table was written under (n,w)=" +
        meta.map(r => s"(${r.getAs[Int]("n")},${r.getAs[Int]("w")})")
          .mkString(",") + s", query posed under (n,w)=($n,$w)")
    withSelection(increment, idCol, textCol, n, w)
      .select(col("doc_id"), size(col("sel")).cast("long").as("n_selected"),
        explode_outer(col("sel")).as("fp"))
      .filter(col("fp").isNotNull)
      .join(CorpusWriter.readWinnowIndex(spark, table)
        .withColumn("__seen", lit(1L)), Seq("fp"), "left")
      .groupBy("doc_id", "n_selected")
      .agg(coalesce(sum("__seen"), lit(0L)).as("n_seen"))
      .select(col("doc_id"), col("n_selected"), col("n_seen"),
        (col("n_seen").cast("double") / col("n_selected").cast("double"))
          .as("seen_frac"))
      .orderBy("doc_id")
  }

  /** The fp-keyed self-join mirror of [[pairs]] — equivalence-test
    * fixture only (a hot fingerprint squares through the shuffle here;
    * the shipped form emits array-side from the bounded cell). */
  private[graft] def joinPairs(docs: DataFrame, idCol: String,
      textCol: String, n: Int, w: Int, minShared: Int,
      maxDf: Int = MaxDf): DataFrame = {
    val fps = withSelection(docs, idCol, textCol, n, w)
      .select(col("doc_id"), explode_outer(col("sel")).as("fp"))
      .filter(col("fp").isNotNull)
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf)).select("fp")
    val live = fps.join(broadcast(keep), "fp")
    live.as("a").join(live.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB CTE computing each doc's ordered gram-hash list and the
    * winnowed selection — the same 63-bit byte fold, window minima, and
    * degenerate short-doc rule as the operator. */
  private def selCteSql(n: Int, w: Int): String = {
    val fp = graft.oracle.Duck.gramHash63Sql(
      s"array_to_string(t[__wi:__wi+${n - 1}], ' ')")
    s"""toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |fps AS (
       |  SELECT doc_id,
       |    list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |      __wi -> $fp) AS f
       |  FROM toks),
       |sel AS (
       |  SELECT doc_id, len(f) AS n_grams,
       |    CASE
       |      WHEN len(f) = 0 THEN []
       |      WHEN len(f) <= $w THEN [list_min(f)]
       |      ELSE list_distinct(list_transform(
       |        range(1, len(f) - $w + 2),
       |        __wj -> list_min(f[__wj:__wj+${w - 1}])))
       |    END AS s
       |  FROM fps)""".stripMargin
  }

  /** DuckDB oracle for [[report]] on table `documents`. */
  def reportOracleSql(n: Int, w: Int): String =
    s"""WITH ${selCteSql(n, w)}
       |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       |  CAST(len(s) AS BIGINT) AS n_selected,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), s),
       |    (__wa, __wx) -> xor(__wa, __wx)) AS fp_xor
       |FROM sel ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[decontam]] on table `documents`:
    * `evalPredSql` must render the same eval predicate. */
  def decontamOracleSql(evalPredSql: String, n: Int, w: Int): String =
    s"""WITH ${selCteSql(n, w)},
       |ev AS (SELECT doc_id FROM documents WHERE ($evalPredSql)),
       |evfp AS (
       |  SELECT DISTINCT unnest(s) AS fp FROM sel
       |  WHERE doc_id IN (SELECT doc_id FROM ev)),
       |cor AS (
       |  SELECT doc_id, len(s) AS n_selected, unnest(s) AS fp FROM sel
       |  WHERE doc_id NOT IN (SELECT doc_id FROM ev))
       |SELECT doc_id, CAST(n_selected AS BIGINT) AS n_selected,
       |  CAST(count(*) AS BIGINT) AS n_hit
       |FROM cor JOIN evfp USING (fp)
       |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[admitAgainstIndex]] where the stored index
    * holds the selection of the non-increment corpus and the increment
    * is `incPredSql`'s slice of `documents`. */
  def admitOracleSql(incPredSql: String, n: Int, w: Int): String =
    admitOracleSql(incPredSql, s"doc_id NOT IN (SELECT doc_id FROM inc)",
      n, w)

  /** [[admitOracleSql]] with an INDEPENDENT reference predicate — the
    * retirement gate's shape (q179, mirroring [[Novelty.oracleSql]]'s
    * two-predicate form): after [[CorpusWriter.retireFromWinnowIndex]]
    * the live index is the REMAINING corpus's selection, no longer the
    * increment's complement. */
  def admitOracleSql(incPredSql: String, referencePredSql: String,
      n: Int, w: Int): String =
    s"""WITH ${selCteSql(n, w)},
       |inc AS (SELECT doc_id FROM documents WHERE ($incPredSql)),
       |idx AS (
       |  SELECT DISTINCT unnest(s) AS fp FROM sel
       |  WHERE $referencePredSql),
       |probe AS (
       |  SELECT doc_id, len(s) AS n_selected, unnest(s) AS fp FROM sel
       |  WHERE doc_id IN (SELECT doc_id FROM inc)),
       |cnt AS (
       |  SELECT probe.doc_id, probe.n_selected,
       |    CAST(coalesce(sum(CASE WHEN idx.fp IS NOT NULL THEN 1 END), 0)
       |      AS BIGINT) AS n_seen
       |  FROM probe LEFT JOIN idx ON probe.fp = idx.fp
       |  GROUP BY 1, 2)
       |SELECT doc_id, CAST(n_selected AS BIGINT) AS n_selected, n_seen,
       |  CAST(n_seen AS DOUBLE) / CAST(n_selected AS DOUBLE) AS seen_frac
       |FROM cnt ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[pairs]] on table `documents` — the quadratic
    * self-join the operator's array-side emission avoids. */
  def pairsOracleSql(n: Int, w: Int, minShared: Int,
      maxDf: Int = MaxDf): String =
    s"""WITH ${selCteSql(n, w)},
       |df AS (
       |  SELECT doc_id, unnest(s) AS fp FROM sel),
       |keep AS (
       |  SELECT fp FROM df GROUP BY fp
       |  HAVING count(*) BETWEEN 2 AND $maxDf),
       |live AS (
       |  SELECT doc_id, fp FROM df WHERE fp IN (SELECT fp FROM keep))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS shared_fps
       |FROM live a JOIN live b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared
       |ORDER BY doc_a, doc_b""".stripMargin
}
