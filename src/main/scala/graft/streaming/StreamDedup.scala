package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time exact deduplication — the streaming complement of the
  * batch dedup family (q20/q21): as documents arrive, the FIRST
  * occurrence of each content fingerprint passes through and every later
  * duplicate is dropped, however many micro-batches later it shows up.
  * This is the shape a continuous crawl-ingest pipeline runs in front of
  * the corpus store, where batch dedup would mean re-scanning the
  * accumulated corpus per increment.
  *
  * Two implementations of the same semantics:
  *  - [[batch]]: replay over a bounded snapshot — lowest doc id per
  *    fingerprint wins, with the duplicate count per group. One
  *    hash-shuffle of (fp, id) pairs; SQL-expressible,
  *    DuckDB-oracle-checked (q52);
  *  - [[firstSeen]]: `flatMapGroupsWithState` in Append mode — state per
  *    fingerprint is the kept doc id, a first sight emits exactly one
  *    row, a duplicate emits nothing (StreamDedupSpec drives it over
  *    multi-batch MemoryStream input and pins agreement with [[batch]]).
  *    The two agree on which ROWS survive for any arrival order; the
  *    kept ID per fingerprint additionally matches [[batch]]'s
  *    min(doc_id) only when ids arrive ascending across micro-batches
  *    (an id-ordered ingest log — the spec's fixtures are ascending by
  *    construction). A LATER batch carrying a LOWER id for an
  *    already-seen fingerprint keeps the earlier, higher id: streaming
  *    first-occurrence is arrival-order semantics by definition, and
  *    that is the honest production contract — it cannot know about ids
  *    it has not seen yet.
  *
  * Scale shape: only (fingerprint, id) longs ever shuffle — content
  * bytes stay at the scan, exactly the q20 rule. Streaming state is one
  * long per DISTINCT fingerprint; that grows with the corpus by
  * definition of exact dedup (the operator's honest contract — a
  * production deployment bounds it with a TTL timeout accepting
  * re-admitted dupes past the horizon, or fronts it with the batch
  * canonical corpus and streams only the increment).
  */
object StreamDedup {

  /** Bounded-snapshot replay: (fp, kept_doc_id, n_docs) per distinct
    * fingerprint, lowest id kept. */
  def batch(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.GraftFunctions.rollingHash(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("kept_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy("kept_doc_id")
  }

  /** DuckDB oracle for [[batch]] over table `documents`. */
  def oracleSql: String =
    s"""SELECT fp, kept_doc_id, n_docs FROM (
       |  SELECT ${graft.oracle.Duck.rollingHashSql("text")} AS fp,
       |    min(doc_id) AS kept_doc_id, count(*) AS n_docs
       |  FROM documents GROUP BY 1)
       |ORDER BY kept_doc_id""".stripMargin

  final case class Kept(fp: Long, doc_id: Long)

  /** Streaming first-occurrence filter over (fp, doc_id) pairs: emits
    * one [[Kept]] row the first time a fingerprint is seen (lowest id
    * if several arrive in the same micro-batch) and nothing for any
    * later duplicate. Matches [[batch]] replay exactly when ids arrive
    * ascending across micro-batches — see the object scaladoc for the
    * arrival-order caveat. */
  def firstSeen(pairs: Dataset[(Long, Long)]): Dataset[Kept] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Long, Kept](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (fp: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            var keep = Long.MaxValue
            it.foreach { case (_, id) => if (id < keep) keep = id }
            state.update(keep)
            Iterator.single(Kept(fp, keep))
          }
      }
  }
}
