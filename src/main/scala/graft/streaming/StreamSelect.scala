package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Selection

/** At-ingest data selection — the FROZEN persisted model
  * ([[Selection.buildSelectionModel]]) applied to an unbounded document
  * stream: every micro-batch is scored map-side (DSIR importance weight
  * + Gumbel key + the offline `key_threshold_micro` admission, plus the
  * stupid-backoff LM score and its tier diagnostics) without ever
  * re-reading the training corpus. This is how "select top-k of the
  * pool" deploys online: the k-th key of the offline resample becomes a
  * stateless per-document threshold.
  *
  * Stateless by construction — scores are pure per-document functions of
  * the frozen model, so there is no state store, no watermark, no replay
  * ledger to maintain (redelivered batches re-emit identical rows; the
  * downstream sink dedupes by doc_id if it needs exactly-once, the
  * [[IdempotentSink]] pattern). The model's driver-resident part (weight
  * array, thresholds, LM table counts) is memoized per model dir inside
  * [[Selection]], so a deployment-length stream pays the model load
  * once, not per micro-batch.
  */
object StreamSelect {

  /** Score every micro-batch of `docs` (`(doc_id, text, …)`) against the
    * model at `modelDir` and hand the scored batch to `sink`. Returns the
    * un-started writer; the caller picks checkpointing and `.start()`s. */
  def scoredIngest(docs: DataFrame, modelDir: String)
                  (sink: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // per-batch checkpoint scope (the fullIngest hygiene): anything the
      // scorer materializes is consumed by the sink write below
      graft.Checkpoints.scoped {
        sink(Selection.scoreWithStoredModel(batch.sparkSession, batch, modelDir))
      }
    }
}
