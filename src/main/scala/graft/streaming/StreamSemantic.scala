package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Similarity

/** Streaming semantic decontamination — [[Similarity.semanticDecontam]]
  * (q73) composed with the streaming front door, completing the
  * batch/streaming duality the other two admission families already
  * have: exact dedup pairs q56 with [[StreamDedup]], containment pairs
  * q67 with [[StreamContainment]], and embedding-space decontamination
  * pairs q73 with this.
  *
  * Each micro-batch of arriving vectors is annotated against the
  * STANDING eval suite: per batch row, the nearest eval neighbor by
  * cosine and the `tau` flag, exactly the q73 output columns. The eval
  * frame broadcasts inside every batch (an eval suite is MBs of
  * vectors — the held-out-set contract), so the recurring per-batch
  * cost is one map-side scoring pass over the batch plus the bounded
  * ≤ 1×P-rows-per-vector max shuffle. No state store: unlike
  * [[StreamDedup]]'s first-wins or [[StreamContainment]]'s sidecar, the
  * reference set here is static, so admission is trivially
  * arrival-order independent and the union of per-batch results equals
  * the batch q73 replay EXACTLY (no stop-bound boundary cases —
  * StreamSemanticSpec pins bit-equality on the fixture split).
  *
  * Cache hygiene: the scoring path registers no query-lifetime frames,
  * but the collecting-scope release is kept anyway so a future change
  * to the scoring chain cannot silently leak — the request-scoped
  * discipline of [[StreamContainment]] and the `/pipeline` route. */
object StreamSemantic {

  /** Configure (not start) the admission stream: `vecs` is a streaming
    * DataFrame carrying `idCol` + `embCol`; `evalVecs` the static eval
    * suite with the same columns; `sink` receives each micro-batch's
    * annotated rows and the batch id. The caller sets trigger/queryName
    * and calls `.start()` (the [[graft.server]] convention — deployment
    * knobs stay with the deployer). */
  def admit(vecs: DataFrame, evalVecs: DataFrame, idCol: String,
      embCol: String, tau: Double)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, frames) = graft.ops.Materialize.collecting {
          val flagged = Similarity.semanticDecontamAgainst(
            batch, evalVecs, idCol, embCol, tau)
          sink(flagged, batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
