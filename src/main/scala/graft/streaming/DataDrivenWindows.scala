package graft.streaming

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Hll

/** Exact-semantics tier (SURVEY.md §2.1/§2.2 tier 3): bit-for-bit replica
  * of the reference's data-driven flush behavior
  * (`/root/reference/processor/processor.go:79-102`):
  *
  *  1. insert uid into the sketch BEFORE the flush check — the triggering
  *     message counts toward the window being closed (`:87`);
  *  2. flush when `ts > lastFlush + interval` (STRICTLY greater, `:89`);
  *  3. emitted Timestamp is the PREVIOUS flush time (window start, `:91`);
  *  4. on flush: fresh sketch, `lastFlush = ts`, interval recomputed from
  *     the new window start with Go `AddDate` calendar overflow
  *     normalization (`:36-53`);
  *  5. initial state: `lastFlush = 0`, `interval = intervalFrom(0)` —
  *     so the first message of any realistic stream immediately emits a
  *     degenerate `(Type, 0, 1)` window (`:80-82`);
  *  6. the trailing in-flight window is never emitted (`main.go` shutdown
  *     discards state — O8).
  *
  * Implemented as `flatMapGroupsWithState` keyed by granularity, holding
  * `(hllRegisters, lastFlush, interval)` — the direct Spark analogue of the
  * reference's per-granularity closure state. Values are sorted by ts
  * within each micro-batch; cross-batch ordering relies on source order,
  * exactly as the reference relies on Kafka single-partition order
  * (SURVEY.md §2.1.3). Differences: UTC calendar (Go uses the process-local
  * zone) and xxHash64-based estimates (reference: metroHash) — flush
  * timing and window boundaries are hash-independent and match exactly.
  */
object DataDrivenWindows {

  final case class WindowState(registers: Array[Byte], lastFlush: Long, interval: Long)

  /** Go `time.AddDate(years, months, 0)` from epoch seconds, UTC: month-end
    * overflow NORMALIZES (Jan 31 + 1 month = Mar 2/3), unlike java.time's
    * `plusMonths` clamping (`processor.go:46,49`). */
  def goAddDate(ts: Long, years: Int, months: Int): Long = {
    val dt = LocalDateTime.ofEpochSecond(ts, 0, ZoneOffset.UTC)
    val firstOfTarget = LocalDate.of(dt.getYear + years, 1, 1)
      .plusMonths(dt.getMonthValue - 1 + months)
    val datePart = firstOfTarget.plusDays(dt.getDayOfMonth - 1)
    LocalDateTime.of(datePart, dt.toLocalTime).toEpochSecond(ZoneOffset.UTC)
  }

  /** `StatType.intervalFrom(timestamp)` — `processor.go:36-53`. */
  def intervalFrom(statType: String, ts: Long): Long = statType match {
    case "minute_count" => 60L
    case "day_count"    => 86400L
    case "week_count"   => 604800L
    case "month_count"  => goAddDate(ts, 0, 1) - ts
    case "year_count"   => goAddDate(ts, 1, 0) - ts
    case other          => throw new IllegalArgumentException(other)
  }

  private def freshState(statType: String): WindowState =
    WindowState(Hll.emptyRegisters(), 0L, intervalFrom(statType, 0L))

  /** The reference's per-message loop (`processor.go:85-101`) over an
    * event-time-ordered iterator. Shared by the streaming (stateful) and
    * batch (fresh-state) paths. */
  private def processSorted(statType: String, msgs: Iterator[UserMsg],
                            init: WindowState): (Seq[StatMsg], WindowState) = {
    var st = init
    val out = Seq.newBuilder[StatMsg]
    msgs.foreach { m =>
      Hll.add(st.registers, Hll.hash(m.uid)) // insert BEFORE flush check
      if (m.ts > st.lastFlush + st.interval) { // strict >
        // estimate includes the just-inserted triggering uid
        out += StatMsg(statType, st.lastFlush, Hll.estimate(st.registers))
        st = WindowState(Hll.emptyRegisters(), m.ts, intervalFrom(statType, m.ts))
      }
    }
    (out.result(), st)
  }

  private def update(statType: String, msgs: Iterator[(String, UserMsg)],
                     state: GroupState[WindowState]): Iterator[StatMsg] = {
    // per-micro-batch event-time sort; the reference's cross-message order
    // comes from Kafka, ours from the source within a batch. Array +
    // in-place stable sort, not toSeq.sortBy — this tier's parallelism is
    // capped at 5 groups, so per-group constant factors are the throughput
    val arr = msgs.map(_._2).toArray
    scala.util.Sorting.stableSort(arr, (a: UserMsg, b: UserMsg) => a.ts < b.ts)
    val (out, st) = processSorted(statType, arr.iterator,
      state.getOption.getOrElse(freshState(statType)))
    state.update(st)
    out.iterator
  }

  /** Fan the message stream out to all five granularities and apply the
    * stateful data-driven windowing. Works on streaming Datasets (the
    * driver path) — batch parity tests go through MemoryStream. */
  def apply(spark: SparkSession, msgs: Dataset[UserMsg]): Dataset[StatMsg] = {
    import spark.implicits._
    msgs
      .flatMap(m => graft.core.Buckets.granularities.map(g => (s"${g}_count", m)))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch replay of the same semantics: `flatMapSortedGroups` hands each
    * granularity an event-time-sorted iterator (Spark sorts within the
    * shuffle — no driver-side collect), fresh state per run — exactly the
    * reference's "re-run reprocesses the topic from the start"
    * (`README.md:5`). Trailing windows are discarded, as in the reference.
    *
    * Parallelism is capped at 5 (one sequential pass per granularity) BY
    * DESIGN: the reference's flush rule is order-dependent, so exact parity
    * requires a single in-order scan per granularity. This tier exists for
    * parity; the scalable tiers are [[graft.core.Cardinality]] (batch) and
    * [[CalendarAppendWindows]] (streaming append), whose aggregations
    * partition freely.
    */
  def batch(spark: SparkSession, msgs: Dataset[UserMsg]): Dataset[StatMsg] = {
    import spark.implicits._
    msgs
      .flatMap(m => graft.core.Buckets.granularities.map(g => (s"${g}_count", m)))
      .groupByKey(_._1)
      .flatMapSortedGroups(col("_2").getField("ts")) { (statType, it) =>
        processSorted(statType, it.map(_._2), freshState(statType))._1
      }
  }
}
