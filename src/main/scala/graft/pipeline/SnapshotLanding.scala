package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.oracle.Duck

/** Snapshot landing — the composition [[CorpusDiff]]'s scaladoc
  * promises: when corpus version B lands over standing version A,
  * (1) classify ids (added / removed / changed), (2) RETIRE the stale
  * index rows (removed and changed ids leave the standing side — a
  * changed document must not collide with its own superseded text),
  * (3) admit exactly the `added ∪ changed` slice against what remains,
  * under q56's exact-fingerprint + banded-MinHash rules. One operator
  * answers the operational question "what does this release actually
  * add, and how much of it is already content we keep?".
  *
  * Scale shape: the diff is the q76 slim-fingerprint full-outer join
  * (text never moves), MATERIALIZED because three consumers read it
  * (index retirement anti-join, increment id selection, output status
  * join) — and it is CHANGE-sized, so every downstream join against it
  * is AQE-broadcastable. Retirement is a left-anti join on the
  * change-sized frame, the admission is [[IncrementalDedup.admissions]]
  * unchanged (increment-sized band join, corpus-side distinct-fp
  * semi-join), and nothing corpus-scale is computed that q56 would not
  * already compute — composition, not recomputation. */
object SnapshotLanding {

  /** (doc_id, status ∈ added|changed, exact_dup, near_dup, admitted)
    * for every document of `b` the diff marks as new content, admitted
    * against `a`'s retired-and-surviving index. */
  def landingAdmissions(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, minSim: Double): DataFrame = {
    // Change-sized; three consumers (see scaladoc).
    val changes = graft.ops.Materialize.barrier(
      CorpusDiff.diff(a, b, idCol, textCol))
    // a ∩ changes = removed ∪ changed — exactly the stale rows.
    val standing = IncrementalDedup.index(a, idCol, textCol)
      .join(changes, Seq("doc_id"), "left_anti")
    val incomingIds = changes.filter(col("status") =!= "removed")
    val incoming = b.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      .join(incomingIds.select("doc_id"), "doc_id")
    IncrementalDedup.admissions(standing, incoming, "doc_id", "text", minSim)
      .join(incomingIds, "doc_id")
      .select(col("doc_id"), col("status"), col("exact_dup"),
        col("near_dup"), col("admitted"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[landingAdmissions]] over table `documents`,
    * snapshots derived exactly as [[CorpusDiff.oracleSql]]'s: `a` =
    * rows matching `aPredSql`, `b` = rows matching `bPredSql` with
    * `bEditPredSql` rows' text edited. Replays the diff, composes the
    * standing ∪ increment relation, and runs the
    * [[MinHashDedup.ctePrefixSql]]/[[IncrementalDedup.admissionCtesSql]]
    * derivation over it unchanged. */
  def oracleSql(aPredSql: String, bPredSql: String, bEditPredSql: String,
      minSim: Double): String = {
    val pre =
      s"""WITH av AS (
         |  SELECT doc_id, text FROM documents WHERE ($aPredSql)),
         |bv AS (
         |  SELECT doc_id,
         |    CASE WHEN ($bEditPredSql) THEN text || ' edited' ELSE text END AS text
         |  FROM documents WHERE ($bPredSql)),
         |afp AS (SELECT doc_id, ${Duck.rollingHashSql("text")} AS fp_a FROM av),
         |bfp AS (SELECT doc_id, ${Duck.rollingHashSql("text")} AS fp_b FROM bv),
         |stc AS (
         |  SELECT doc_id, status FROM (
         |    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |           CASE WHEN a.doc_id IS NULL THEN 'added'
         |                WHEN b.doc_id IS NULL THEN 'removed'
         |                WHEN fp_a <> fp_b THEN 'changed' END AS status
         |    FROM afp a FULL OUTER JOIN bfp b ON a.doc_id = b.doc_id)
         |  WHERE status IS NOT NULL),
         |docs2 AS (
         |  SELECT a.doc_id, a.text, FALSE AS is_inc FROM av a
         |  WHERE a.doc_id NOT IN (SELECT doc_id FROM stc)
         |  UNION ALL
         |  SELECT b.doc_id, b.text, TRUE AS is_inc FROM bv b
         |  WHERE b.doc_id IN (SELECT doc_id FROM stc WHERE status <> 'removed'))""".stripMargin
    s"""$pre,
       |${MinHashDedup.ctePrefixSql("docs2").stripPrefix("WITH ")},
       |${IncrementalDedup.admissionCtesSql(
           "SELECT doc_id, " + Duck.rollingHashSql("text") +
             " AS fp, is_inc FROM docs2", minSim)}
       |SELECT i.doc_id, s.status,
       |  i.doc_id IN (SELECT doc_id FROM ex) AS exact_dup,
       |  i.doc_id IN (SELECT doc_id FROM near) AS near_dup,
       |  NOT (i.doc_id IN (SELECT doc_id FROM ex)
       |    OR i.doc_id IN (SELECT doc_id FROM near)) AS admitted
       |FROM fp i JOIN stc s ON s.doc_id = i.doc_id
       |WHERE i.is_inc ORDER BY i.doc_id""".stripMargin
  }
}
