package graft.streaming

import java.time.{Instant, ZoneId, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{Hll, SparseHll}

/** Append-mode calendar-bucket distinct counting for ALL five reference
  * granularities — including month/year, which the windowed-aggregate tier
  * ([[CardinalityStream.aggregated]]) can only run in update/complete
  * modes: `window()` cannot express calendar months, and grouping by
  * `date_trunc` severs the watermark→aggregation linkage that append mode
  * requires (SURVEY.md §8.4 gap 2).
  *
  * Mechanism: `flatMapGroupsWithState` keyed by (granularity, bucket
  * start), one fixed-size HLL register set per open bucket, and an
  * EVENT-TIME TIMEOUT at the bucket's calendar end — when the watermark
  * passes the bucket end, the bucket emits `(Type, Timestamp, Value)`
  * exactly once and its state is freed. Late rows behind the watermark are
  * filtered by Spark before they reach the operator (late-data drop), so a
  * sealed bucket can never resurrect.
  *
  * Scale notes: state per open bucket is a [[graft.functions.SparseHll]]
  * sketch — exact sorted-hash-set bytes while small, a dense 16 KiB HLL
  * register file only past 512 distinct uids (the axiomhq two-mode design
  * the reference depends on) — so total state is bounded by Σ min(uids,
  * 512)×8B + dense-bucket count × 16 KiB, independent of stream length;
  * keys hash-partition across executors.
  * Surviving-row invariant: a row reaching the operator has
  * `event_time ≥ watermark`, and its bucket end > event_time, so the
  * timeout timestamp is always strictly ahead of the watermark (required
  * by `setTimeoutTimestamp`).
  */
object CalendarAppendWindows {

  final case class BucketState(registers: Array[Byte])

  /** Calendar end (epoch seconds) of the bucket starting at `bucketStart`.
    * Calendar-true for month/year (java.time clamping is irrelevant here:
    * `date_trunc` starts are always day 1 / Jan 1).
    *
    * `zone` MUST be the session time zone that produced the `date_trunc`
    * bucket starts — calendar arithmetic in a different zone mis-places
    * month boundaries by the zone offset (and DST-transition days are 23
    * or 25 hours long, which `ZonedDateTime.plusDays` handles and fixed
    * UTC arithmetic does not). A premature bucket end would let a sealed
    * bucket re-emit or make the event-time timeout non-monotonic. */
  def bucketEnd(granularity: String, bucketStart: Long,
                zone: ZoneId = ZoneOffset.UTC): Long = {
    val zdt = Instant.ofEpochSecond(bucketStart).atZone(zone)
    (granularity match {
      case "minute" => zdt.plusMinutes(1)
      case "day"    => zdt.plusDays(1)
      case "week"   => zdt.plusDays(7)
      case "month"  => zdt.plusMonths(1)
      case "year"   => zdt.plusYears(1)
      case other    => throw new IllegalArgumentException(other)
    }).toInstant.getEpochSecond
  }

  private def update(granularity: String, zone: ZoneId)(
      key: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
      state: GroupState[BucketState]): Iterator[StatMsg] =
    if (state.hasTimedOut) {
      val est = SparseHll.estimate(state.get.registers)
      state.remove()
      Iterator.single(StatMsg(s"${granularity}_count", key, est))
    } else {
      // sparse-until-threshold sketch: fine-grained buckets are mostly
      // low-cardinality, so state stays ~bytes-per-uid instead of a dense
      // 16 KiB register file per open bucket (measured 1.6x stream
      // throughput on the reference benchmark workload, StreamBench)
      var sketch = state.getOption.map(_.registers).getOrElse(SparseHll.empty())
      rows.foreach(r => sketch = SparseHll.add(sketch, Hll.hash(r._2)))
      state.update(BucketState(sketch))
      state.setTimeoutTimestamp(bucketEnd(granularity, key, zone) * 1000L)
      Iterator.empty
    }

  /** One granularity's append-mode stream over `parsed` (`uid`,
    * `event_time` — [[CardinalityStream.parse]] output). */
  def aggregated(spark: SparkSession, parsed: DataFrame, granularity: String,
                 watermark: String = "10 minutes"): Dataset[StatMsg] = {
    import spark.implicits._
    // date_trunc buckets in the SESSION time zone — bucket ends must be
    // computed in the same zone. Parsed ONCE here (ZoneId serializes into
    // the closure); SHORT_IDS because Spark accepts three-letter session
    // zones ("PST") that plain ZoneId.of rejects
    val zone = ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone, ZoneId.SHORT_IDS)
    parsed.withWatermark("event_time", watermark)
      .select(
        unix_timestamp(date_trunc(granularity, col("event_time"))).as("bucket_start"),
        col("uid"), col("event_time"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(granularity, zone))
  }

  /** All five granularities, one append-mode stream in the reference
    * output shape — the full O3 fan-out with watermark-bounded state. */
  def allGranularities(spark: SparkSession, parsed: DataFrame,
                       watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    graft.core.Buckets.granularities
      .map(g => aggregated(spark, parsed, g, watermark).toDF())
      .reduce(_ unionAll _)
  }
}
