package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator building a 64-bit SimHash fingerprint in ONE aggregate
  * function: the buffer is the per-bit ±1 histogram (64 long counters), the
  * finish step packs sign bits.
  *
  * The column-per-bit formulation (`agg(sum(when(bit j set, 1, -1)) x 64)`)
  * keeps 64 aggregate expressions alive through partial+final aggregation —
  * near the `spark.sql.codegen.maxFields` cliff and measurably slower (the
  * round-1 shape was the slowest-but-one dedup query). One Aggregator with
  * a primitive long-array buffer and a JIT'd inner loop is mergeable
  * (slot-wise add), so partial aggregation still distributes map-side.
  *
  * Fingerprint parity: bit j of the result is `popcount-weighted sign` over
  * tokens' `xxhash64` bit j, strictly-positive ⇒ 1 — identical to the
  * column formulation it replaces (DedupSpec pins the law vs brute force).
  */
class SimHashAggregator(bits: Int)
    extends Aggregator[(Long, Long), Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val h = in._2
    var j = 0
    while (j < bits) {
      buf(j) += (((h >>> j) & 1L) << 1) - 1 // +1 if bit set, else -1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(r: Array[Long]): Long = {
    var fp = 0L
    var j = 0
    while (j < bits) { if (r(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
