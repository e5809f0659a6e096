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
}
