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
  * Two independent guards, each sufficient on its own:
  *  1. **transactional batch skip** — `foreachBatch` hands the sink
  *     `(batch, batchId)`; the sink persists the last committed id and
  *     drops any batch with `batchId <= committed` (the standard
  *     idempotent-`foreachBatch` recipe);
  *  2. **keyed upsert** — rows merge on `(Type, Timestamp)` taking
  *     `greatest(old, new)` (update-mode re-emissions of a growing bucket
  *     are monotone non-decreasing), so even a replay that slips past the
  *     id check (e.g. a rebuilt checkpoint restarting batch numbering)
  *     converges to the same keyed state instead of appending duplicates.
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

  /** `(lastCommittedBatchId, currentSnapshotDir)` — `(-1, None)` before the
    * first commit. The pointer file is one line: `<batchId> <dirname>`. */
  private def committed(): (Long, Option[String]) =
    if (!Files.exists(pointer)) (-1L, None)
    else {
      val parts = new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim.split(" ")
      (parts(0).toLong, Some(parts(1)))
    }

  /** The current committed output set — one row per `(Type, Timestamp)`. */
  def current(spark: SparkSession): DataFrame = committed() match {
    case (_, Some(dir)) => spark.read.parquet(Paths.get(path, dir).toString)
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
  def upsert(batch: DataFrame, batchId: Long): Unit = synchronized {
    val (last, _) = committed()
    if (batchId <= last) {
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
    val nextDir = s"v$batchId"
    merged.write.mode("overwrite").parquet(Paths.get(path, nextDir).toString)
    val tmp = Paths.get(path, "_current.tmp")
    Files.write(tmp, s"$batchId $nextDir".getBytes(StandardCharsets.UTF_8))
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
      .foreachBatch((df: DataFrame, id: Long) => sink.upsert(df, id))
      .start()
}
