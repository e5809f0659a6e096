package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Plain-Scala HyperLogLog, precision p=14 (16 384 registers) — the same
  * register count as the reference's sketch (axiomhq/hyperloglog default,
  * `/root/reference/go.mod:6`; expected rse ≈ 1.04/√2^14 ≈ 0.81%,
  * `README.md:4`). Standard public algorithm (Flajolet et al. 2007, with
  * linear-counting small-range correction as in HLL++); hash is xxHash64
  * via Spark's catalyst implementation, so estimates are NOT bit-identical
  * to the reference (which uses metroHash) — parity is semantic (§2.2).
  *
  * The byte-array register file is the aggregation buffer AND the stream
  * state: mergeable (max per register), fixed 16 KiB, serialization-free
  * (`Array[Byte]` is its own wire format). That mergeability is what lets
  * Spark split the aggregate into partial (per-partition) and final
  * (post-shuffle) steps — the distributed analogue of the reference's
  * single in-process sketch.
  */
object Hll {
  val P = 14
  val M: Int = 1 << P // 16384 registers

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  def hash(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
  }

  def add(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    // rank = position of the leftmost 1-bit in the remaining 50 bits, 1-based
    val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Union. CONSUMES `a` (mutated in place and returned) — aggregation-
    * buffer semantics; use only the returned array. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Ertl's improved estimator ("New cardinality estimation algorithms for
    * HyperLogLog sketches", arXiv:1702.01284): a single smooth formula over
    * the register-value histogram — no linear-counting/raw-mode switch, so
    * no bias dip in the transition zone (the classic estimator measured
    * +2.65% at n≈2.5m where rse is 0.81%; this one stays within ~1%
    * everywhere, see HllSpec sweep). Constant-free: σ and τ are evaluated
    * by their converging iterations.
    */
  def estimate(regs: Array[Byte]): Long = {
    val q = 64 - P // max storable rank is q+1
    val c = new Array[Int](q + 2)
    var i = 0
    while (i < M) { c(regs(i)) += 1; i += 1 }
    var z = M * tau(1.0 - c(q + 1).toDouble / M)
    var k = q
    while (k >= 1) { z = 0.5 * (z + c(k)); k -= 1 }
    z += M * sigma(c(0).toDouble / M)
    val alphaInf = 1.0 / (2.0 * math.log(2.0))
    math.round(alphaInf * M.toDouble * M.toDouble / z)
  }

  /** σ(x) = x + Σ_{k≥1} x^(2^k) · 2^(k−1) */
  private def sigma(x0: Double): Double = {
    if (x0 == 1.0) return Double.PositiveInfinity
    var x = x0
    var y = 1.0
    var z = x
    var zPrev = 0.0
    do {
      zPrev = z
      x = x * x
      z += x * y
      y += y
    } while (z != zPrev)
    z
  }

  /** τ(x) = (1 − x − Σ_{k≥1} (1 − x^(2^−k))² · 2^(−k)) / 3 */
  private def tau(x0: Double): Double = {
    if (x0 == 0.0 || x0 == 1.0) return 0.0
    var x = x0
    var y = 1.0
    var z = 1.0 - x
    var zPrev = 0.0
    do {
      zPrev = z
      x = math.sqrt(x)
      y *= 0.5
      val d = 1.0 - x
      z -= d * d * y
    } while (z != zPrev)
    z / 3.0
  }
}

/** Typed distinct-count Aggregator over the HLL buffer — usable with
  * `ds.select(HllAggregator.toColumn)`, or registered for SQL via
  * `spark.udf.register("hll_distinct", functions.udaf(new HllAggregator))`.
  */
class HllAggregator extends Aggregator[String, Array[Byte], Long] {
  override def zero: Array[Byte] = Hll.emptyRegisters()
  override def reduce(b: Array[Byte], a: String): Array[Byte] = {
    if (a != null) Hll.add(b, Hll.hash(a))
    b
  }
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = Hll.merge(b1, b2)
  override def finish(r: Array[Byte]): Long = Hll.estimate(r)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
