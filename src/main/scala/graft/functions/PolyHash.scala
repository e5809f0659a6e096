package graft.functions

/** The repo's portable hash family: polynomial hashes over Unicode CODE
  * POINTS modulo a prime just below 2³⁰, with every intermediate inside
  * overflow-checked non-negative BIGINT arithmetic. That bound is the
  * whole point — DuckDB (the correctness oracle) rejects 64-bit overflow
  * instead of wrapping, so any hash the oracle must recompute has to stay
  * under 2⁶³ at every step. `(acc * Base + codePoint) % Mod` peaks near
  * 2⁵⁰ (`Mod·Base ≈ 2³⁰·2²⁰`).
  *
  * A PRIME modulus (not 2³⁰) matters: mod a power of two, bit 0 of every
  * odd-base polynomial hash equals the parity of the code-point sum, so
  * differently-based hashes would have perfectly correlated low bits.
  *
  * Consumers: [[SimHash]] (three hashes packed to 63 bits),
  * [[graft.operators.Dedup]] shingle identity ([[packed60]]) and the
  * MinHash permutation family ([[MinHashSigAggregator]]).
  */
object PolyHash {
  /** Largest prime below 2³⁰ (= 2³⁰ − 35). */
  val Mod = 1073741789L
  val BaseA = 1000003L
  val BaseB = 999983L
  val BaseC = 1000033L

  /** Polynomial hash of `s`'s code points with the given base, in
    * [0, [[Mod]]). Iterates CODE POINTS (a surrogate pair is one symbol),
    * matching the oracle's `regexp_split_to_array(s, '')` + `ascii()`. */
  def poly(s: String, base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * base + s.codePointAt(i)) % Mod
      i += Character.charCount(s.codePointAt(i))
    }
    h
  }

  /** Two independent 30-bit hashes packed as `hA<<30 | hB` — a 60-bit
    * identity hash (non-negative, bit 63 clear). A single 30-bit hash
    * would birthday-collide at ~10⁵ distinct keys; 60 bits pushes chance
    * collisions out past 10⁸, while both halves stay individually
    * recomputable in the oracle and individually small enough for the
    * `(a·hA + b·hB + c) % Mod` permutation family to stay under 2⁶³. */
  def packed60(s: String): Long = {
    var hA = 0L
    var hB = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      hA = (hA * BaseA + cp) % Mod
      hB = (hB * BaseB + cp) % Mod
      i += Character.charCount(cp)
    }
    (hA << 30) | hB
  }
}
