package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CardinalityStream, IdempotentSink, IdempotentStatsSink}

/** Exactly-once-style delivery (SURVEY.md §7.4): Spark's at-least-once
  * redelivery collapses to the reference's observable output set when the
  * sink is a `(Type, Timestamp)`-keyed upsert. Both guards are exercised
  * directly: the transactional batch-id skip and the keyed monotone merge. */
class IdempotentSinkSpec extends AnyFunSuite with SparkTestBase {

  import org.apache.spark.sql.functions._

  private def keyed(sink: IdempotentStatsSink): Map[(String, Long), Long] =
    sink.current(spark).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed stats land keyed and a replayed micro-batch leaves the output set unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("idem_sink").toString
    val sink = new IdempotentStatsSink(s"$root/out")
    val input = MemoryStream[String](spark)
    input.addData(
      """{"uid":"alice","ts":1468244384}""",
      """{"uid":"bob","ts":1468244384}""",
      """{"uid":"carol","ts":1468244444}""")
    val q = IdempotentSink.start(
      CardinalityStream.allGranularities(CardinalityStream.parse(input.toDF())),
      sink, s"$root/ckpt")
    try {
      q.processAllAvailable()
      val afterFirst = keyed(sink)
      // 5 granularities over 2 distinct minutes: minute_count has 2 keys,
      // the 4 coarser granularities 1 each
      assert(afterFirst.keys.count(_._1 == "minute_count") == 2)
      assert(afterFirst.size == 6)
      assert(afterFirst(("day_count", 1468195200L)) == 3)

      // guard 1 — transactional skip: redelivering an already-committed
      // batchId is dropped wholesale, even with CORRUPTED values; a sink
      // without the guard would regress day_count to 999
      val poisoned = sink.current(spark).withColumn("Value", lit(999L))
      sink.upsert(poisoned, batchId = 0L)
      assert(keyed(sink) == afterFirst, "replayed batchId must be a no-op")

      // growth still flows: a later event in an existing bucket raises its
      // count in place — same key set for that bucket, higher Value
      input.addData("""{"uid":"dave","ts":1468244385}""")
      q.processAllAvailable()
      val afterGrowth = keyed(sink)
      assert(afterGrowth(("day_count", 1468195200L)) == 4)
      assert(afterGrowth.keys.count(_._1 == "minute_count") == 2)

      // guard 2 — keyed monotone merge: a replay that slips the id check
      // (rebuilt checkpoint restarting batch numbers) re-delivers the same
      // rows under a FRESH id; the upsert converges instead of duplicating.
      // (Runs after the stream is drained: a fresh-id direct call advances
      // the sink's committed id past the stream's own batch numbering.)
      sink.upsert(sink.current(spark), batchId = 1000000L)
      assert(keyed(sink) == afterGrowth, "keyed upsert must converge under redelivery")
      assert(sink.current(spark).groupBy("Type", "Timestamp").count()
        .filter(col("count") > 1).isEmpty, "one row per (Type, Timestamp)")
    } finally q.stop()
  }

  test("stale-value redelivery under a fresh batchId cannot regress a bucket (monotone max)") {
    import spark.implicits._
    val root = Files.createTempDirectory("idem_sink2").toString
    val sink = new IdempotentStatsSink(s"$root/out")
    sink.upsert(Seq(("day_count", 100L, 5L)).toDF("Type", "Timestamp", "Value"), 0L)
    // an OLD emission of the same bucket (count when it held 2 users)
    // arrives again under a fresh id — e.g. an operator reprocessing a
    // prefix; max-merge keeps the later, larger count
    sink.upsert(Seq(("day_count", 100L, 2L)).toDF("Type", "Timestamp", "Value"), 1L)
    assert(keyed(sink) == Map(("day_count", 100L) -> 5L))
  }

  test("rebuilt checkpoint (fresh run tag, restarted batch ids) merges instead of dropping") {
    import spark.implicits._
    val root = Files.createTempDirectory("idem_sink3").toString
    val sink = new IdempotentStatsSink(s"$root/out")
    // run A commits batches 0..1
    sink.upsert(Seq(("day_count", 100L, 5L)).toDF("Type", "Timestamp", "Value"), 0L, "run-A")
    sink.upsert(Seq(("day_count", 100L, 6L)).toDF("Type", "Timestamp", "Value"), 1L, "run-A")
    // checkpoint rebuilt: run B restarts numbering at 0. Its batch 0
    // carries a NEW bucket whose final value never re-emits later — the
    // exact loss mode of an id-only guard (ADVICE r7): dropped wholesale,
    // hour_count would be permanently absent
    sink.upsert(Seq(("day_count", 100L, 4L), ("week_count", 200L, 7L))
      .toDF("Type", "Timestamp", "Value"), 0L, "run-B")
    assert(keyed(sink) == Map(("day_count", 100L) -> 6L, ("week_count", 200L) -> 7L),
      "cross-run regressed ids must merge (monotone), not skip")
    // run B's OWN numbering now governs guard 1: replaying its batch 0 is
    // a no-op even with corrupted values
    sink.upsert(Seq(("day_count", 100L, 999L)).toDF("Type", "Timestamp", "Value"), 0L, "run-B")
    assert(keyed(sink) == Map(("day_count", 100L) -> 6L, ("week_count", 200L) -> 7L))
    // and run B progresses normally past its committed id
    sink.upsert(Seq(("week_count", 200L, 8L)).toDF("Type", "Timestamp", "Value"), 1L, "run-B")
    assert(keyed(sink)(("week_count", 200L)) == 8L)
  }

  test("torn commit (snapshot written, pointer not swung) is healed by the replay") {
    import spark.implicits._
    val root = Files.createTempDirectory("idem_sink4").toString
    val out = s"$root/out"
    val sink = new IdempotentStatsSink(out)
    sink.upsert(Seq(("day_count", 100L, 3L)).toDF("Type", "Timestamp", "Value"), 0L, "run-A")
    val afterCommit = keyed(sink)
    // construct the torn state on disk: batch 1's snapshot dir fully
    // written (with DIVERGENT content, as a mid-write crash could leave)
    // and a stale _current.tmp, but the pointer never swung
    Seq(("day_count", 100L, 999L)).toDF("Type", "Timestamp", "Value")
      .write.mode("overwrite").parquet(s"$out/v1")
    Files.write(java.nio.file.Paths.get(out, "_current.tmp"), "1 v1 run-A".getBytes())
    // readers still see the committed snapshot — the orphan is invisible
    assert(keyed(sink) == afterCommit, "torn state must not be observable")
    // recovery replays batch 1: id 1 > committed 0, so it processes,
    // overwrites the orphan dir, and swings the pointer
    sink.upsert(Seq(("day_count", 100L, 4L)).toDF("Type", "Timestamp", "Value"), 1L, "run-A")
    assert(keyed(sink) == Map(("day_count", 100L) -> 4L),
      "replay must overwrite the orphan snapshot and commit")
    // the replayed commit fully supersedes the torn artifacts: a further
    // replay of batch 1 is now a no-op (pointer holds id 1)
    sink.upsert(Seq(("day_count", 100L, 999L)).toDF("Type", "Timestamp", "Value"), 1L, "run-A")
    assert(keyed(sink) == Map(("day_count", 100L) -> 4L))
  }
}
