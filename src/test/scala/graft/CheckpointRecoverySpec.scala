package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlSource
import graft.streaming.DataDrivenWindows

/** The reference discards all window state on shutdown (SURVEY.md §2 O8 —
  * in-flight windows are never flushed and a restart reprocesses from the
  * topic start). Spark checkpointing improves on that: this spec stops a
  * data-driven-window streaming query mid-stream, restarts it from the
  * checkpoint with new input, and asserts the flush sequence equals a
  * single uninterrupted run — i.e. the per-granularity sketch state
  * survived the restart.
  */
class CheckpointRecoverySpec extends AnyFunSuite with SparkTestBase {

  private def writeLines(dir: File, name: String, msgs: Seq[(String, Long)]): Unit = {
    val w = new PrintWriter(new File(dir, name))
    msgs.foreach { case (u, t) => w.println(s"""{"uid":"$u","ts":$t}""") }
    w.close()
  }

  test("data-driven window state survives a query restart via checkpoint") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("ckpt-in").toFile
    val out = java.nio.file.Files.createTempDirectory("ckpt-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-state").toString

    val base = 1468244384L
    // monotone stream split across two files/phases; minute windows flush
    // repeatedly WITHIN each phase and once ACROSS the restart boundary
    val phase1 = (0 until 120).map(i => (s"u${i % 8}", base + i * 20L))
    val phase2 = (120 until 240).map(i => (s"u${i % 8}", base + i * 20L))

    def startQuery() = {
      val msgs = JsonlSource.readStream(spark, in.getAbsolutePath)
        .select($"uid", unix_timestamp($"event_time").as("ts"))
        .as[graft.streaming.UserMsg]
      DataDrivenWindows(spark, msgs).toDF()
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    }

    writeLines(in, "a.jsonl", phase1)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    writeLines(in, "b.jsonl", phase2)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.schema("Type STRING, Timestamp LONG, Value LONG").json(out)
      .filter($"Type" === "minute_count")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

    // single uninterrupted simulation over ALL messages (exact distinct —
    // per-window uid counts here are ≤ 8, where the HLL is exact)
    var seen = Set.empty[String]
    var lastFlush = 0L
    var interval = DataDrivenWindows.intervalFrom("minute_count", 0L)
    val sim = Seq.newBuilder[(Long, Long)]
    (phase1 ++ phase2).foreach { case (u, t) =>
      seen += u
      if (t > lastFlush + interval) {
        sim += ((lastFlush, seen.size.toLong))
        seen = Set.empty; lastFlush = t
        interval = DataDrivenWindows.intervalFrom("minute_count", t)
      }
    }
    assert(got == sim.result(),
      s"restart diverged from uninterrupted run:\n got=$got\n sim=${sim.result()}")
    // the cross-restart flush exists: some window starting in phase1
    // territory was flushed by a phase2 message
    assert(got.nonEmpty && got.map(_._1).exists(_ >= base + 100 * 20))
  }

  test("append-mode calendar bucket state survives a query restart via checkpoint") {
    val in = java.nio.file.Files.createTempDirectory("cal-in").toFile
    val out = java.nio.file.Files.createTempDirectory("cal-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cal-state").toString

    val jul1 = 1467331200L // 2016-07-01 UTC (month bucket start)
    val jul11 = 1468244384L
    val aug2 = 1470096000L

    def startQuery() = {
      val parsed = JsonlSource.readStream(spark, in.getAbsolutePath)
      graft.streaming.CalendarAppendWindows
        .aggregated(spark, parsed, "month", watermark = "10 minutes").toDF()
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    }

    // phase 1: two distinct July uids; bucket stays open (no seal yet)
    writeLines(in, "a.jsonl", Seq(("m1", jul11), ("m2", jul11 + 100)))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // phase 2 AFTER RESTART: one more July uid, then August advances the
    // watermark past July's end — the sealed count must include phase-1
    // state (3 uids), proving the HLL registers survived the restart
    writeLines(in, "b.jsonl", Seq(("m3", jul11 + 200), ("adv1", aug2)))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    writeLines(in, "c.jsonl", Seq(("adv2", aug2 + 60)))
    val q3 = startQuery()
    q3.processAllAvailable(); q3.stop()

    import spark.implicits._
    val sealed2 = spark.read.schema("Type STRING, Timestamp LONG, Value LONG").json(out)
      .filter($"Type" === "month_count" && $"Timestamp" === jul1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(sealed2 == Seq((jul1, 3L)),
      s"July bucket should seal once with all 3 uids across restarts: $sealed2")
  }
}
