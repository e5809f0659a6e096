package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once-STYLE delivery for the stats stream, closing the last
  * documented divergence from the reference's delivery model (SURVEY.md
  * §7.4).
  *
  * The reference fires each stat message at its sink once per process
  * lifetime and loses in-flight state on crash — at-most-once
  * (`kafkaio.go:88-105`, `main.go:13-28`). Spark's checkpointed sinks
  * re-deliver the last uncommitted micro-batch after recovery —
  * at-least-once. The gap closes at the SINK, not in the engine: the
  * output domain is keyed by `(Type, Timestamp)` and the windowed count
  * for a key is a deterministic, monotone function of the consumed input
  * prefix, so an upsert keyed on `(Type, Timestamp)` makes redelivery a
  * no-op — the observable output SET equals an exactly-once run's.
  *
  * Two guards with distinct roles (NOT each sufficient alone — guard 1
  * is an optimization that must not preempt guard 2 across runs):
  *  1. **transactional batch skip** — `foreachBatch` hands the sink
  *     `(batch, batchId)`; the sink persists the last committed id AND
  *     the run tag it was committed under (the streaming query id from
  *     the checkpoint metadata), and drops a batch with
  *     `batchId <= committed` only when the tags prove it is the SAME
  *     run's redelivery (the standard idempotent-`foreachBatch` recipe,
  *     scoped to its run);
  *  2. **keyed upsert** — rows merge on `(Type, Timestamp)` taking
  *     `greatest(old, new)` (update-mode re-emissions of a growing bucket
  *     are monotone non-decreasing). A REBUILT checkpoint restarts batch
  *     numbering at 0 under a fresh query id: those batches carry keys
  *     whose final growth may never re-emit later, so they must not be
  *     skipped — the tag mismatch routes them here, and the merge
  *     converges instead of appending duplicates or losing buckets.
  *     Untagged direct calls (tests/tools) keep id-check-only semantics:
  *     with no tag evidence either way, a regressed id is treated as the
  *     same run's replay.
  *
  * At 100 TB the upsert target is a keyed external store — a Delta
  * `MERGE`, a wide-row KV put, a JDBC upsert — and guard 2 is a property
  * of that store; this implementation demonstrates the semantics against
  * a local parquet snapshot committed by atomic pointer swap, which is
  * exactly the shape of a table-format commit. The snapshot rewrite is
  * proportional to the LIVE key set (buckets, not events) — bounded by
  * the granularity fan-out, not the input volume, so the per-batch cost
  * stays flat at any input scale.
  */
class IdempotentStatsSink(val path: String) extends Serializable {

  private def pointer = Paths.get(path, "_current")

  /** `(lastCommittedBatchId, currentSnapshotDir, runTag)` — `(-1, None,
    * "")` before the first commit. The pointer file is one line:
    * `<batchId> <dirname> <tag>`, tag `-` when the committing caller was
    * untagged (older two-field pointers parse the same way). */
  private def committed(): (Long, Option[String], String) =
    if (!Files.exists(pointer)) (-1L, None, "")
    else {
      val parts = new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim.split(" ")
      (parts(0).toLong, Some(parts(1)),
        if (parts.length > 2 && parts(2) != "-") parts(2) else "")
    }

  /** The current committed output set — one row per `(Type, Timestamp)`. */
  def current(spark: SparkSession): DataFrame = committed() match {
    case (_, Some(dir), _) => spark.read.parquet(Paths.get(path, dir).toString)
    case _ =>
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("Type", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("Timestamp", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("Value", org.apache.spark.sql.types.LongType))))
  }

  /** The `foreachBatch` body. Synchronized: micro-batches of one query
    * arrive serially, but the guard also makes direct replay calls from
    * tests/tools safe. */
  def upsert(batch: DataFrame, batchId: Long, runTag: String = ""): Unit = synchronized {
    val (last, lastDir, lastTag) = committed()
    // skip only a provably-same-run redelivery: when both tags are known
    // and DIFFER, the regressed id means a rebuilt checkpoint restarted
    // numbering — its batches may hold a bucket's final value, so they
    // fall through to the keyed merge instead of being dropped wholesale
    val sameRun = runTag.isEmpty || lastTag.isEmpty || runTag == lastTag
    if (batchId <= last && sameRun) {
      // guard 1: replayed micro-batch is a no-op for the OUTPUT — but the
      // batch plan must still execute: on a checkpoint-recovery replay the
      // upstream stateful aggregation re-runs this batch, and Spark 4's
      // state-store commit validation fails the query if the sink skips
      // the action (state partitions would never commit)
      batch.write.format("noop").mode("overwrite").save()
      return
    }
    val spark = batch.sparkSession
    // guard 2: keyed merge, monotone max — within-batch duplicates and
    // cross-batch re-emissions of the same bucket collapse to one row
    val incoming = batch
      .select(col("Type").cast("string"), col("Timestamp").cast("long"),
              col("Value").cast("long"))
      .groupBy(col("Type"), col("Timestamp")).agg(max(col("Value")).as("Value"))
    val merged = current(spark).unionByName(incoming)
      .groupBy(col("Type"), col("Timestamp")).agg(max(col("Value")).as("Value"))
    // commit protocol: write the full next snapshot beside the live one,
    // then atomically swing the pointer. A crash after the write but
    // before the swing leaves an orphan dir and an uncommitted batchId —
    // the replay overwrites both. Readers never observe a torn snapshot.
    // the committed id is scoped to the run tag it is stored with: a
    // cross-run fall-through commits the NEW run's batchId (+tag), so the
    // new run's subsequent batches pass guard 1 against their own
    // numbering; an id regression can't double-apply anything because the
    // merge is keyed and monotone
    // never write over the snapshot the merge is reading: a cross-run
    // fall-through at the same batchId alternates to a sibling name
    val nextDir = if (lastDir.contains(s"v$batchId")) s"v${batchId}x" else s"v$batchId"
    merged.write.mode("overwrite").parquet(Paths.get(path, nextDir).toString)
    val tmp = Paths.get(path, "_current.tmp")
    Files.write(tmp, s"$batchId $nextDir ${if (runTag.isEmpty) "-" else runTag}"
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object IdempotentSink {

  /** Wire a stats stream (the output of
    * [[CardinalityStream.allGranularities]]) into an idempotent keyed
    * sink. Update mode: a bucket re-emits as it grows and the upsert
    * keeps the latest — downstream reads converge to the same final set
    * the reference's single fire-at-seal would produce, without its
    * crash-loss. */
  def start(stats: DataFrame, sink: IdempotentStatsSink, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stats.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      // tag each batch with the checkpoint's query id: a recovery of the
      // SAME checkpoint redelivers under the same tag (guard 1 skips), a
      // REBUILT checkpoint gets a fresh query id and its restarted batch
      // numbering falls through to the keyed merge instead of being dropped
      .foreachBatch((df: DataFrame, id: Long) =>
        sink.upsert(df, id, queryTag(checkpointDir)))
      .start()

  /** The streaming query id persisted in `<checkpointDir>/metadata` —
    * stable across recoveries of one checkpoint, fresh when the checkpoint
    * is rebuilt. Read lazily per batch (the file exists before the first
    * batch fires); empty string if unreadable (degrades to id-check-only). */
  private[streaming] def queryTag(checkpointDir: String): String =
    try {
      val meta = Paths.get(checkpointDir, "metadata")
      if (!Files.exists(meta)) ""
      else """"id"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(new String(Files.readAllBytes(meta), StandardCharsets.UTF_8))
        .map(_.group(1)).getOrElse("")
    } catch { case _: java.io.IOException => "" }
}
