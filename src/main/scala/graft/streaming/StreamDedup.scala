package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the streaming twin of
  * [[graft.operators.Dedup.exactDedup]], for at-ingest dedup of a training
  * event/document stream.
  *
  * `dropDuplicatesWithinWatermark` keeps one state row per key only until
  * the watermark passes the first-seen event time plus the delay — state
  * is bounded by (keys per watermark horizon), not by stream history,
  * which is what makes exact streaming dedup viable at scale (the naive
  * `dropDuplicates` keeps every key forever). Duplicates arriving within
  * the horizon are dropped; a key reappearing after its state expires is
  * treated as new (at-least-once dedup, the standard trade).
  */
object StreamDedup {

  /** Deduplicate `parsed` (`uid`, `event_time` —
    * [[CardinalityStream.parse]] output) on the given key columns within
    * the watermark horizon. */
  def withinWatermark(parsed: DataFrame, watermark: String = "10 minutes",
                      keys: Seq[String] = Seq("uid")): DataFrame =
    parsed.withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Cross-corpus STREAMING dedup: drop incoming documents whose
    * fingerprint already exists in a STATIC base-corpus fingerprint table —
    * a stream–static left-anti join, the streaming twin of
    * [[graft.operators.Dedup.crossCorpusNewDocs]] ("dedupe the incoming
    * crawl against the existing corpus, at ingest").
    *
    * Stream–static joins keep NO stream state: each micro-batch probes the
    * static side as-of that batch (broadcast when small, shuffled
    * otherwise). At 100 TB the static side is the persisted fingerprint
    * index; for a first-pass pre-filter at that scale, swap in a bloom of
    * the index (the [[graft.operators.Dedup.crossCorpusNewDocs]] layout)
    * and let the exactness re-check run downstream in batch. */
  def againstCorpus(stream: DataFrame, corpusFps: DataFrame,
                    fpCol: String = "fp_md5"): DataFrame =
    stream.join(corpusFps.select(fpCol), Seq(fpCol), "left_anti")

  /** NEAR-dup streaming dedup against the persisted MinHash-LSH index
    * (round-12 verdict task 2): each micro-batch runs
    * [[graft.operators.Dedup.nearDupIncrementSurvivors]] — sign the batch,
    * probe the stored postings with the batch's band keys, verify on
    * signatures, drop convicted docs, append the batch to the index so the
    * NEXT micro-batch (and tomorrow's) sees it. The per-batch plan is
    * byte-for-byte the batch increment's (shared `incrementCandidates`
    * core: bounded broadcast probe, eager touched-∪-batch materialization,
    * GUARD-ARMED hot-bucket trim), so stream-kept ≡ batch-kept by
    * construction — StreamingSpec pins the law against an independent
    * full-pair oracle anyway.
    *
    * Aggregation-bearing batch code can't ride inside a continuous
    * streaming plan (a banded self-join + signature verify is neither
    * stateless nor watermark-windowed), so this leg is a `foreachBatch`
    * writer — Spark's idiomatic reuse-batch-operators-per-micro-batch
    * mechanism, the same shape as [[IdempotentSink]]. The caller supplies
    * the sink body and starts the returned writer (choosing checkpoint
    * location etc.); `memoPrefix#batchId` scopes the per-batch shingle
    * guard.
    *
    * REPLAY safety (the [[IdempotentSink]] batch-skip guard applied to
    * index growth): Structured Streaming redelivers a micro-batch after
    * recovery, and a naive re-append would add the batch's rows twice.
    * [[nearDupBatch]] records each appended `batchId` as a marker file in
    * `indexDir/_stream_appends/` and replays skip the append (survivors
    * are still computed and re-delivered to the sink — at-least-once
    * OUTPUT, exactly-once index growth per completed batch). The residual
    * torn-commit window (crash between append and marker) can only
    * duplicate index ROWS, which provably cannot change any drop decision
    * — candidate pairs and the drop set are `distinct()` sets —
    * and [[graft.operators.Dedup.compactIndex]] removes the duplicates. */
  def nearDupAgainstIndex(stream: DataFrame, indexDir: String,
                          memoPrefix: String, threshold: Double = 0.5,
                          append: Boolean = true)
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // per-batch checkpoint scope: the sink call fully consumes the
      // survivors, so the increment's checkpoints are freed at batch close
      // instead of accumulating for the stream's lifetime (round-14
      // verdict task 3; the DocPipeline.fullIngest argument)
      graft.Checkpoints.scoped {
        sink(nearDupBatch(batch, batchId, indexDir, memoPrefix, threshold, append))
      }
    }

  /** The batchId-ledger replay guard shared by every index-appending
    * stream leg: on first delivery run the body with appends ON and record
    * the batchId marker AFTER the append (so a torn commit replays — the
    * duplicated-rows residue is argued at [[nearDupAgainstIndex]]); on
    * redelivery run it with appends OFF (survivors are recomputed and
    * re-delivered — at-least-once output, exactly-once index growth). With
    * `append = false` the guard is inert: no appends, no markers. */
  private def replayGuarded(batch: DataFrame, batchId: Long, indexDir: String,
                            append: Boolean)
                           (run: Boolean => DataFrame): DataFrame = {
    val ledger = new org.apache.hadoop.fs.Path(s"$indexDir/_stream_appends")
    val marker = new org.apache.hadoop.fs.Path(ledger, batchId.toString)
    val fs = ledger.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val doAppend = append && !fs.exists(marker)
    val survivors = run(doAppend)
    if (doAppend) {
      fs.mkdirs(ledger)
      fs.create(marker, true).close()
    }
    survivors
  }

  /** One micro-batch of [[nearDupAgainstIndex]] — factored out so the
    * replay guard is testable without a streaming restart. */
  private[graft] def nearDupBatch(batch: DataFrame, batchId: Long,
                                  indexDir: String, memoPrefix: String,
                                  threshold: Double = 0.5,
                                  append: Boolean = true): DataFrame =
    replayGuarded(batch, batchId, indexDir, append) { doAppend =>
      // strictIds = false: a torn-commit redelivery legitimately carries
      // ids the crashed append already landed — the id guard downgrades
      // to the documented TORN-REPLAY warning instead of wedging the
      // stream (batch callers keep the strict refusal)
      graft.operators.Dedup.nearDupIncrementSurvivors(
        batch.sparkSession, batch, indexDir, s"$memoPrefix#$batchId",
        threshold, append = doAppend, strictIds = false)
    }

  /** NEAR-dup streaming dedup of a VECTOR stream (`vec_id`, `embedding`)
    * against the persisted embedding (SRP-LSH) index — the
    * [[nearDupAgainstIndex]] shape on the third index family: each
    * micro-batch runs
    * [[graft.operators.Dedup.embeddingIncrementSurvivors]] (project only
    * the batch, probe the stored postings, verify with exact cosine on
    * stored vectors, drop convicted vectors, append the batch so the next
    * micro-batch sees it), under the same batchId-ledger replay guard. */
  def embeddingAgainstIndex(stream: DataFrame, indexDir: String,
                            threshold: Double = 0.4,
                            nBands: Int = 16, bandBits: Int = 4,
                            append: Boolean = true)
                           (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.Checkpoints.scoped { // per-batch hygiene, see nearDupAgainstIndex
        sink(embeddingBatch(batch, batchId, indexDir, threshold, nBands, bandBits,
          append))
      }
    }

  /** One micro-batch of [[embeddingAgainstIndex]] (testable without a
    * streaming restart). */
  private[graft] def embeddingBatch(batch: DataFrame, batchId: Long,
                                    indexDir: String,
                                    threshold: Double = 0.4,
                                    nBands: Int = 16, bandBits: Int = 4,
                                    append: Boolean = true): DataFrame =
    replayGuarded(batch, batchId, indexDir, append) { doAppend =>
      graft.operators.Dedup.embeddingIncrementSurvivors(
        batch.sparkSession, batch, indexDir, threshold, nBands, bandBits,
        append = doAppend,
        strictIds = false) // torn-replay tolerance, see nearDupBatch
    }

  /** SEMANTIC streaming ingest: each micro-batch of vectors merges into a
    * persisted [[graft.operators.Dedup.buildSemanticIndex]] index via
    * [[graft.operators.Dedup.semanticDedupIncrement]] (frozen stored
    * model, touched-cell probe, decision merge with keep re-election),
    * under the same batchId-ledger replay guard as the other index
    * families. The sink receives the increment's full decision output
    * (`vec_id, cid, cluster_id, cent_e4, keep`) — downstream chooses
    * whether to act on `keep` or store the group labels. */
  def semanticAgainstIndex(stream: DataFrame, indexDir: String,
                           append: Boolean = true)
                          (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.Checkpoints.scoped { // per-batch hygiene, see nearDupAgainstIndex
        sink(semanticBatch(batch, batchId, indexDir, append))
      }
    }

  /** One micro-batch of [[semanticAgainstIndex]] (testable without a
    * streaming restart). */
  private[graft] def semanticBatch(batch: DataFrame, batchId: Long,
                                   indexDir: String,
                                   append: Boolean = true): DataFrame =
    replayGuarded(batch, batchId, indexDir, append) { doAppend =>
      graft.operators.Dedup.semanticDedupIncrement(
        batch.sparkSession, batch, indexDir, append = doAppend,
        strictIds = false) // torn-replay tolerance, see nearDupBatch
    }

  /** SPAN-boilerplate removal at ingest: each micro-batch of `(doc_id,
    * text)` documents is cleaned against the persisted
    * [[graft.operators.Dedup.buildSpanIndex]] index via
    * [[graft.operators.Dedup.spanRemovalIncrement]] (chunk the batch
    * only, probe the stored per-span aggregate, keep-one-canonical rule),
    * under the shared batchId-ledger replay guard. The sink receives
    * `(doc_id, n_spans, n_removed, clean_text)` — the C4-style line-dedup
    * step applied at the stream boundary instead of a nightly rewrite. */
  def spanRemovalAgainstIndex(stream: DataFrame, indexDir: String,
                              append: Boolean = true)
                             (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.Checkpoints.scoped { // per-batch hygiene, see nearDupAgainstIndex
        sink(spanBatch(batch, batchId, indexDir, append))
      }
    }

  /** One micro-batch of [[spanRemovalAgainstIndex]] (testable without a
    * streaming restart). */
  private[graft] def spanBatch(batch: DataFrame, batchId: Long,
                               indexDir: String,
                               append: Boolean = true): DataFrame =
    replayGuarded(batch, batchId, indexDir, append) { doAppend =>
      graft.operators.Dedup.spanRemovalIncrement(
        batch.sparkSession, batch, indexDir, append = doAppend,
        strictIds = false) // torn-replay tolerance, see nearDupBatch
    }
}
