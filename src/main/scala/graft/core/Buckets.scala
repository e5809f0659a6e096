package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar time-bucketing for the five granularities of the reference
  * (`/root/reference/processor/processor.go:24-32` — minute/day/week/month/
  * year distinct counts).
  *
  * The reference's windows are data-driven (flush when event time passes
  * `lastFlush + interval`, `processor.go:89`); the idiomatic Spark tier uses
  * calendar-aligned buckets via `date_trunc` (SURVEY.md §2.2 tier 1). The
  * exact data-driven tier lives in [[graft.streaming.DataDrivenWindows]].
  *
  * Bucket values are exposed as epoch **seconds** (LongType) — matching the
  * reference's `StatMsg.Timestamp` (epoch seconds, `processor.go:20`) and
  * avoiding timestamp-precision/timezone ambiguity in oracle comparisons.
  */
object Buckets {
  /** StatType labels, `processor.go:26-32`. */
  val granularities: Seq[String] =
    Seq("minute", "day", "week", "month", "year")

  def label(g: String): String = s"${g}_count"

  /** Calendar bucket start of `ts` at granularity `g`, as epoch seconds.
    * `date_trunc` is a codegen'd built-in; weeks are ISO (Monday-start) in
    * both Spark and DuckDB, months/years calendar-true (vs the reference's
    * Go `AddDate` arithmetic — divergence documented in SURVEY.md §7.4).
    */
  def bucketStart(g: String, ts: Column): Column =
    unix_timestamp(date_trunc(g, ts))

  /** DuckDB SQL equivalent of [[bucketStart]] for oracle queries. */
  def bucketStartSql(g: String, ts: String): String =
    s"CAST(epoch(date_trunc('$g', $ts)) AS BIGINT)"
}
