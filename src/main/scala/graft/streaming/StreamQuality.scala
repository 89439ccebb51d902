package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.QualityClassifier

/** Streaming quality scoring — [[QualityClassifier]] (q77) composed
  * with the streaming front door: train once on the labeled static
  * corpus, score every arriving micro-batch under the FROZEN weights.
  * The fourth batch/streaming duality (exact dedup q56/[[StreamDedup]],
  * containment q67/[[StreamContainment]], semantic decontam
  * q73/[[StreamSemantic]], quality q77/this), and the deployment shape
  * a curation filter actually runs in: the model is a training-time
  * artifact, the stream only pays one codegen'd feature-projection +
  * literal-dot scan per batch.
  *
  * No state store and the weights never change mid-stream, so scoring
  * is trivially arrival-order independent and the union of per-batch
  * results is BIT-equal to [[QualityClassifier.scoreWith]] over the
  * same rows (StreamQualitySpec pins it against the q77 trainAndScore
  * replay). Per-batch request-scoped cache release keeps a long-running
  * stream leak-free even though the scoring path registers nothing. */
object StreamQuality {

  /** Configure (not start) the scoring stream: `docs` is a streaming
    * DataFrame carrying the four document columns; `w` the
    * [[QualityClassifier.train]]-ed weights; `sink` receives each
    * micro-batch's `(doc_id, y, score, pred)` rows and the batch id.
    * The caller sets trigger/queryName and calls `.start()`. */
  def score(docs: DataFrame, idCol: String, langCol: String,
      textCol: String, nCharsCol: String, posLang: String, w: Array[Long])(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, frames) = graft.ops.Materialize.collecting {
          val scored = QualityClassifier.scoreWith(batch, idCol, langCol,
            textCol, nCharsCol, posLang, w)
          sink(scored, batchId)
        }
        graft.ops.Materialize.release(frames)
      }
}
