package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator building a full k-permutation MinHash signature in ONE
  * aggregate function.
  *
  * The column-per-permutation formulation (`agg(min(...perm 0...),
  * min(...perm 1...), ... x128)`) exceeds `spark.sql.codegen.maxFields`
  * (100), silently dropping the whole aggregation out of codegen —
  * measured ~10 s at sf0.1. One Aggregator with a primitive long-array
  * buffer and a JIT'd inner loop does the same work in a fraction of it,
  * and is mergeable (slot-wise min) so partial aggregation distributes.
  *
  * Permutation i is the PORTABLE 2-universal family
  * `(aᵢ·h₁ + bᵢ·h₂ + cᵢ) mod PolyHash.Mod` over the two 30-bit halves of
  * the packed shingle hash ([[PolyHash.packed60]]), with (aᵢ, bᵢ, cᵢ)
  * fixed splitmix-derived constants. Every product stays under
  * `Mod·2³⁰ ≈ 2⁶⁰` — which is what lets the DuckDB oracle recompute the
  * EXACT signatures (and therefore the exact LSH candidate set and
  * Jaccard estimates) from the same constants
  * ([[graft.operators.Dedup.minhashLshPairsSql]]). The previous
  * `xxh64mix(h + i·φ)` re-seeding was a fine permutation family but
  * inexpressible in overflow-checked BIGINT arithmetic, leaving the
  * whole MinHash tier rows-only-checked.
  */
class MinHashSigAggregator(perms: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
  require(perms <= MinHashSigAggregator.MaxPerms)

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val h1 = in._2 >>> 30
    val h2 = in._2 & 0x3FFFFFFFL
    val pa = MinHashSigAggregator.PermA
    val pb = MinHashSigAggregator.PermB
    val pc = MinHashSigAggregator.PermC
    var i = 0
    while (i < perms) {
      val m = (pa(i) * h1 + pb(i) * h2 + pc(i)) % PolyHash.Mod
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
  val MaxPerms = 128

  /** 64-bit finalizer (splitmix64 avalanche — public-domain constant mix).
    * Used only to DERIVE the fixed permutation constants below; the per-
    * shingle hot loop is pure modular arithmetic. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def derive(tag: Long, nonZero: Boolean): Array[Long] =
    Array.tabulate(MaxPerms) { i =>
      val m = java.lang.Math.floorMod(mix(tag * 0x10000 + i), PolyHash.Mod - 1)
      if (nonZero) m + 1 else m // multipliers in [1, Mod), offsets in [0, Mod-1)
    }

  /** Fixed permutation constants, identical in the Scala hot loop and the
    * generated oracle SQL (single-sourced through [[permValuesSql]]). */
  val PermA: Array[Long] = derive(1, nonZero = true)
  val PermB: Array[Long] = derive(2, nonZero = true)
  val PermC: Array[Long] = derive(3, nonZero = false)

  /** The constants as a DuckDB VALUES list `(p, a, b, c)`, `p` 1-based to
    * line up with SQL list indexing. */
  def permValuesSql(perms: Int): String =
    (0 until perms)
      .map(i => s"(${i + 1}, ${PermA(i)}, ${PermB(i)}, ${PermC(i)})")
      .mkString(", ")
}
