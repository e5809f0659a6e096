package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlSource
import graft.streaming.DataDrivenWindows

class JsonlSourceSpec extends AnyFunSuite with SparkTestBase {

  private def writeFixture(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-src").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "stream.jsonl"))
    lines.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  test("batch JSONL read drops malformed lines and parses the rest") {
    val path = writeFixture(Seq(
      """{"uid":"a","ts":1468244384}""",
      """{"uid":"b","ts":1468244389}""",
      "garbage",
      """{"uid":"","ts":1468244395}""")) // empty uid is still a valid record
    val got = JsonlSource.read(spark, path).collect()
    assert(got.length == 3)
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("", "a", "b"))
  }

  test("end-to-end file replay: JSONL -> data-driven windows -> JSONL stats with capitalized keys") {
    import spark.implicits._
    val base = 1468244384L
    val path = writeFixture((0 until 200).map(i =>
      s"""{"uid":"u${i % 9}","ts":${base + i * 45}}"""))
    val msgs = JsonlSource.read(spark, path)
      .select($"uid", org.apache.spark.sql.functions.unix_timestamp($"event_time").as("ts"))
      .as[graft.streaming.UserMsg]
    val stats = DataDrivenWindows.batch(spark, msgs)
    val outDir = java.nio.file.Files.createTempDirectory("graft-stats-out").toString
    JsonlSource.writeStats(stats.toDF(), outDir)
    val lines = spark.read.text(outDir).collect().map(_.getString(0))
    assert(lines.nonEmpty)
    lines.foreach { l =>
      assert(l.startsWith("""{"Type":""") && l.contains(""""Timestamp":""") &&
        l.contains(""""Value":"""), l)
    }
  }
}
