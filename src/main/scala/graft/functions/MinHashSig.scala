package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator building a full k-permutation MinHash signature in ONE
  * aggregate function.
  *
  * The column-per-permutation formulation (`agg(min(xxhash64(0, h)),
  * min(xxhash64(1, h)), ... x128)`) exceeds `spark.sql.codegen.maxFields`
  * (100), silently dropping the whole aggregation out of codegen —
  * measured ~10 s at sf0.1. One Aggregator with a primitive long-array
  * buffer and a JIT'd inner loop does the same work in a fraction of it,
  * and is mergeable (slot-wise min) so partial aggregation distributes.
  *
  * Permutation i of a base shingle hash h is `xxh64mix(h, i)` — a single
  * 64-bit avalanche round per slot, the standard cheap re-seeding.
  */
class MinHashSigAggregator(perms: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val h = in._2
    var i = 0
    while (i < perms) {
      val m = MinHashSigAggregator.mix(h + i * 0x9E3779B97F4A7C15L)
      if (m < buf(i)) buf(i) = m
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashSigAggregator {
  /** 64-bit finalizer (splitmix64 avalanche — public-domain constant mix). */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
