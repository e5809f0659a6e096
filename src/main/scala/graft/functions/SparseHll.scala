package graft.functions

/** Sparse-until-threshold HLL state — the axiomhq-style two-mode sketch
  * the reference relies on (`/root/reference/go.mod:6`: sparse
  * representation at low cardinality). Fine-grained time buckets are
  * overwhelmingly LOW-cardinality: allocating a dense 16 KiB register file
  * per minute bucket turns a 100 TB year of per-minute state into
  * terabytes of mostly-zero bytes. This state starts as an exact sorted
  * set of 64-bit hashes and densifies into [[Hll]] registers only past
  * [[SparseCap]] distinct values.
  *
  * Encoding is discriminated by LENGTH (no tag byte):
  *  - dense: exactly `Hll.M` (16384) bytes — the [[Hll]] register file
  *    verbatim, so dense-mode ops reuse [[Hll]] directly;
  *  - sparse: `[4-byte n][capacity × 8-byte big-endian hashes]`, sorted,
  *    capacity-doubled in place (amortized O(1) allocations per insert).
  *
  * Sparse estimates are EXACT (distinct hash count; 64-bit collisions are
  * negligible at ≤ 512 entries), matching the reference's sparse-mode
  * exactness; dense estimates use Ertl's estimator via [[Hll.estimate]].
  */
object SparseHll {

  /** Densify past this many distinct hashes — 4 KiB sparse max vs 16 KiB
    * dense, and exactness far beyond the ~0.8% HLL error regime. */
  val SparseCap = 512

  def empty(): Array[Byte] = new Array[Byte](4 + 8 * 4) // n=0, 4 slots

  private def readN(s: Array[Byte]): Int =
    ((s(0) & 0xFF) << 24) | ((s(1) & 0xFF) << 16) | ((s(2) & 0xFF) << 8) | (s(3) & 0xFF)

  private def writeN(s: Array[Byte], n: Int): Unit = {
    s(0) = (n >>> 24).toByte; s(1) = (n >>> 16).toByte
    s(2) = (n >>> 8).toByte; s(3) = n.toByte
  }

  private def readHash(s: Array[Byte], i: Int): Long = {
    val o = 4 + 8 * i
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (s(o + j) & 0xFFL); j += 1 }
    h
  }

  private def writeHash(s: Array[Byte], i: Int, h: Long): Unit = {
    val o = 4 + 8 * i
    var j = 0
    while (j < 8) { s(o + j) = (h >>> (8 * (7 - j))).toByte; j += 1 }
  }

  /** Binary search for `h` among the first `n` sorted hashes; returns the
    * insertion point as `-(pos) - 1` when absent (Arrays.binarySearch
    * convention). */
  private def search(s: Array[Byte], n: Int, h: Long): Int = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = readHash(s, mid)
      if (v < h) lo = mid + 1
      else if (v > h) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  private def densify(s: Array[Byte]): Array[Byte] = {
    val regs = Hll.emptyRegisters()
    val n = readN(s)
    var i = 0
    while (i < n) { Hll.add(regs, readHash(s, i)); i += 1 }
    regs
  }

  /** Insert a hash; returns the (possibly reallocated) state. */
  def add(state: Array[Byte], h: Long): Array[Byte] = {
    if (state.length == Hll.M) { Hll.add(state, h); state }
    else {
      val n = readN(state)
      val pos = search(state, n, h)
      if (pos >= 0) state // already present
      else if (n >= SparseCap) { val d = densify(state); Hll.add(d, h); d }
      else {
        val ins = -pos - 1
        val cap = (state.length - 4) / 8
        val target =
          if (n < cap) state
          else { // grow in place: double capacity
            val bigger = new Array[Byte](4 + 8 * math.min(cap * 2, SparseCap))
            System.arraycopy(state, 0, bigger, 0, 4 + 8 * n)
            bigger
          }
        // shift tail right one slot, insert
        System.arraycopy(target, 4 + 8 * ins, target, 4 + 8 * (ins + 1), 8 * (n - ins))
        writeHash(target, ins, h)
        writeN(target, n + 1)
        target
      }
    }
  }

  /** Exact count in sparse mode; Ertl HLL estimate in dense mode. */
  def estimate(state: Array[Byte]): Long =
    if (state.length == Hll.M) Hll.estimate(state) else readN(state).toLong

  /** Union. CONSUMES both inputs — either argument may be mutated in
    * place and returned (aggregation-buffer semantics, like [[Hll.merge]]
    * and Spark `Aggregator.merge`). Use ONLY the returned array; neither
    * input is a valid sketch afterwards. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.length == Hll.M && b.length == Hll.M) Hll.merge(a, b)
    else if (a.length == Hll.M) { addAllInto(a, b); a }
    else if (b.length == Hll.M) { addAllInto(b, a); b }
    else {
      var out = a
      val n = readN(b)
      var i = 0
      while (i < n) { out = add(out, readHash(b, i)); i += 1 }
      out
    }

  private def addAllInto(dense: Array[Byte], sparse: Array[Byte]): Unit = {
    val n = readN(sparse)
    var i = 0
    while (i < n) { Hll.add(dense, readHash(sparse, i)); i += 1 }
  }
}
