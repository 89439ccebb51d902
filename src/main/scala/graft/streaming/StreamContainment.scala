package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.MinHashDedup

/** Streaming containment admission — the stored stratified-containment
  * sidecar ([[graft.pipeline.CorpusWriter.writeStratifiedIndex]], q67)
  * composed with the streaming front door, completing the pattern the
  * exact-dedup family already has: q56 (batch admission) pairs with q52's
  * [[StreamDedup]], and q67 (batch containment admission) pairs with this.
  *
  * Each micro-batch of arriving documents is admitted against the
  * STANDING corpus via the sidecar's two-sided probe
  * ([[MinHashDedup.incrementalContainmentPairs]]'s stored overload): the
  * emitted rows are the (inc_id, corp_id, n_inc, n_corp, containment)
  * pairs where a batch document contains or is contained by a corpus
  * document at ≥ `minCont`. The corpus side never re-shingles and never
  * shuffles — per batch, the recurring cost is the batch's own emission
  * plus the broadcast probe joins over the two bucketed sidecar scans,
  * exactly the q67 steady-state shape.
  *
  * Semantics (deliberate, and where they differ from a batch replay):
  *  - each batch is gated against the CORPUS only — batch-vs-batch pairs
  *    are excluded by the cross-side gate, and batch-vs-earlier-batch
  *    pairs are not computed because earlier increments are NOT folded
  *    into the sidecar here. Folding admitted documents into the corpus
  *    is a corpus-landing operation (rewrite the sidecar with
  *    `writeStratifiedIndex` over the grown corpus), not a per-batch one:
  *    an index whose membership mutates per micro-batch would make
  *    admission results depend on arrival order, the same trade
  *    [[StreamDedup]] documents for kept-id divergence.
  *  - consequently the union of per-batch admissions equals the batch
  *    q65/q67 replay of the whole increment, with one boundary
  *    exception: the MaxKeyDf stop-shingle bound is evaluated against
  *    batch+corpus cell density only, so a cell flooded by the AGGREGATE
  *    increment (but by no single batch) drops in the batch replay yet
  *    still admits here — streaming is the ≥-recall side of the bound
  *    (StreamContainmentSpec pins set equality on the fixture split and
  *    the cross-side exclusion).
  *
  * Driver cost per batch: the sidecar `_meta` (1 row) and `_levels`
  * (≤ 64 rows) collects — bounded metadata, the offset-snapshot
  * discipline (`/root/reference/src/kbrowse/search.clj:162-164`): the
  * corpus-bound state is computed once per batch and reused by every
  * probe within it.
  *
  * Cache hygiene: the stored overload registers one barrier frame (the
  * batch's emission) per call; each batch releases exactly its own
  * frames after `sink` returns — a long-running admission stream holds
  * ZERO accumulated caches across batches, the same request-scoped
  * release discipline as the `/pipeline` route.
  */
object StreamContainment {

  /** Configure (not start) the admission stream: `docs` is a streaming
    * DataFrame carrying `idCol` + `textCol`; `sink` receives each
    * micro-batch's admission pairs and the batch id — write them to a
    * store, reject the flagged documents, or both. The caller sets
    * trigger/queryName and calls `.start()` (the [[graft.server]]
    * convention of returning the writer, so deployment knobs stay with
    * the deployer). */
  def admit(docs: DataFrame, sidecarTable: String, idCol: String,
      textCol: String, minCont: Double,
      span: Int = MinHashDedup.StrataSpan)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch runs driver-side on the stream thread, so the
        // collecting scope sees exactly this batch's registrations.
        val (_, frames) = graft.ops.Materialize.collecting {
          val pairs = MinHashDedup.incrementalContainmentPairs(
            batch.sparkSession, sidecarTable, batch, idCol, textCol,
            minCont, span)
          sink(pairs, batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
