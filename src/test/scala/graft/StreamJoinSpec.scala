package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

class StreamJoinSpec extends AnyFunSuite with SparkTestBase {

  case class Click(user_id: Long, click_id: Long, click_time: java.sql.Timestamp)
  case class Purchase(user_id: Long, purchase_id: Long, purchase_time: java.sql.Timestamp)

  private def ts(epoch: Long) = new java.sql.Timestamp(epoch * 1000)

  test("stream-stream attribution joins purchases to in-window clicks only") {
    import spark.implicits._
    val base = 1468244340L
    val clicks = MemoryStream[Click](spark)
    val purchases = MemoryStream[Purchase](spark)

    val out = StreamJoin.attribution(clicks.toDF(), purchases.toDF(), "30 minutes")
    val q = out.writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      clicks.addData(
        Click(1, 100, ts(base)),            // in window for purchase @ base+600
        Click(1, 101, ts(base + 300)),      // also in window
        Click(2, 200, ts(base)),            // wrong user for p1
        Click(3, 300, ts(base - 3600)))     // out of window for user 3's purchase
      purchases.addData(
        Purchase(1, 900, ts(base + 600)),
        Purchase(3, 901, ts(base + 600)))   // no in-window click -> no row (inner join)
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(rows == Seq((900L, 100L), (900L, 101L)),
        s"got $rows")
    } finally q.stop()
  }
}
