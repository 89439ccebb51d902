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
  *    The two agree on the surviving FINGERPRINT set — one kept row per
  *    distinct fingerprint — for any arrival order; the kept ID per
  *    fingerprint additionally matches [[batch]]'s min(doc_id) only when
  *    ids arrive ascending across micro-batches (an id-ordered ingest
  *    log — StreamDedupSpec pins both: full agreement on ascending
  *    fixtures, and the kept-id divergence when a LATER batch carries a
  *    LOWER id). That later-lower-id duplicate emits nothing and the
  *    earlier, higher id stays kept: streaming first-occurrence is
  *    arrival-order semantics by definition, and that is the honest
  *    production contract — it cannot know about ids it has not seen
  *    yet.
  *
  * Scale shape: only (fingerprint, id) longs ever shuffle — content
  * bytes stay at the scan, exactly the q20 rule. Streaming state is one
  * long per DISTINCT fingerprint; that grows with the corpus by
  * definition of exact dedup, so at 100 TB of ingest the state IS the
  * scale bound. Two independent mitigations, both tested:
  * `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` bounds state in SPACE (off-heap,
  * spills to local disk — the deployment backend once fingerprints
  * outgrow executor heap; StreamDedupSpec runs the operator on it), and
  * [[firstSeen]]'s optional `ttl` bounds it in TIME:
  * state idle past the horizon is evicted (ProcessingTimeTimeout), and a
  * fingerprint re-arriving after eviction is RE-ADMITTED as a first
  * sight — the documented trade (bounded state, duplicates readmitted
  * past the horizon). Default off: q52's exact-dedup semantics are the
  * no-TTL contract. The alternative production shape fronts the stream
  * with the batch canonical corpus and streams only the increment.
  *
  * Why not the built-in? Spark's `dropDuplicatesWithinWatermark` covers
  * the EVENT-TIME-bounded variant of this operator with zero custom
  * state code — when duplicates only ever arrive within a known
  * event-time window, prefer it (StreamDedupSpec proves it on the same
  * fixtures). [[firstSeen]] exists for what it cannot express: unbounded
  * first-occurrence semantics (no watermark bound on how late a
  * duplicate may arrive), the emitted kept-id row shape, and
  * PROCESSING-time TTL (eviction by wall-clock idleness, not event-time
  * progress — an ingest stream that pauses does not advance a watermark
  * but does age wall-clock state).
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
    * arrival-order caveat.
    *
    * `ttl`, when set, bounds state (the 100 TB contract, scaladoc):
    * a fingerprint idle for `ttl` of PROCESSING time is evicted — the
    * clock RESETS on every sighting (sliding idle-horizon: a fingerprint
    * that keeps recurring keeps deduplicating; only cold ones age out),
    * and eviction fires during the next micro-batch after expiry.
    * Operational note: with a processing-time timeout registered the
    * engine schedules additional EMPTY micro-batches to fire timeouts
    * (under the default trigger, continuously) — use a real
    * `Trigger.ProcessingTime` in deployment, and don't rely on
    * `processAllAvailable` as a test barrier (it can block
    * indefinitely; StreamDedupSpec polls the sink instead). Default
    * `None` keeps exact forever-dedup. */
  def firstSeen(pairs: Dataset[(Long, Long)],
      ttl: Option[scala.concurrent.duration.FiniteDuration] = None): Dataset[Kept] = {
    import pairs.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Long, Kept](
        OutputMode.Append(), timeoutConf) {
        (fp: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // Idle past the horizon: drop the fingerprint. A later
            // re-arrival is a first sight again (re-admitted duplicate —
            // the documented TTL trade).
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
            Iterator.empty
          } else {
            var keep = Long.MaxValue
            it.foreach { case (_, id) => if (id < keep) keep = id }
            state.update(keep)
            ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
            Iterator.single(Kept(fp, keep))
          }
      }
  }
}
