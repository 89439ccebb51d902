package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit op between two versions of a
  * document corpus: which ids were ADDED, which REMOVED, and which
  * CHANGED content between snapshot A and snapshot B. Incremental
  * pipelines need this at every landing (what does the new crawl
  * actually change?), and it is the precondition report for the
  * admission family (q56/q67: the `added` slice IS the increment to
  * admit; the `changed` slice must be re-admitted and its stale sidecar
  * rows rewritten).
  *
  * Scale shape: each side reduces to `(doc_id, fp)` AT THE SCAN — the
  * 32-bit rolling fingerprint ([[graft.functions.RollingHashExpr]],
  * codegen'd) — so the full-outer join that classifies ids shuffles two
  * slim long columns per side, never document text. Unchanged ids (the
  * overwhelming mass of a production diff) are dropped by a post-join
  * filter on fingerprint equality, so the OUTPUT is change-sized.
  * Content equality is fingerprint equality: a 2^-32 per-pair false
  * "unchanged" rate under the same fold both engines compute — the
  * documented [[Decontam]] fingerprint trade, and the oracle walks the
  * same bytes so the gate checks the shipped semantics.
  */
object CorpusDiff {

  /** (doc_id, status ∈ added|removed|changed) for every id whose
    * presence or fingerprint differs between `a` (the old snapshot) and
    * `b` (the new one); unchanged ids are absent — a change report, not
    * a corpus listing. */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(a.sparkSession)
    def keyed(df: DataFrame, fpName: String): DataFrame =
      df.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.GraftFunctions.rollingHash(col(textCol)).as(fpName))
    keyed(a, "fp_a").join(keyed(b, "fp_b"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed")))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[diff]] over table `documents`, with the two
    * snapshots derived from it by the registration's predicates:
    * `a` = rows matching `aPredSql`, `b` = rows matching `bPredSql`,
    * where `bEditPredSql` selects b-side rows whose text is EDITED
    * (the registration's deterministic `' edited'` suffix). Fingerprints
    * walk [[graft.oracle.Duck.rollingHashSql]] — the native
    * expression's exact 32-bit fold. */
  def oracleSql(aPredSql: String, bPredSql: String,
      bEditPredSql: String): String =
    s"""WITH a AS (
       |  SELECT doc_id, ${graft.oracle.Duck.rollingHashSql("text")} AS fp_a
       |  FROM documents WHERE ($aPredSql)),
       |b AS (
       |  SELECT doc_id, ${graft.oracle.Duck.rollingHashSql(
             s"CASE WHEN ($bEditPredSql) THEN text || ' edited' ELSE text END")} AS fp_b
       |  FROM documents WHERE ($bPredSql)),
       |j AS (
       |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |         CASE WHEN a.doc_id IS NULL THEN 'added'
       |              WHEN b.doc_id IS NULL THEN 'removed'
       |              WHEN fp_a <> fp_b THEN 'changed' END AS status
       |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
       |SELECT doc_id, status FROM j WHERE status IS NOT NULL
       |ORDER BY doc_id""".stripMargin
}
