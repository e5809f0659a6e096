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
}
