package graft.functions

/** Portable 64-bit SimHash (Charikar, STOC'02): bit j of a document's
  * fingerprint is the sign of Σ(±1) over its tokens' j-th hash bit.
  *
  * The token hash is three independent polynomial hashes over Unicode
  * CODE POINTS modulo a prime just below 2³⁰ (the winnow discipline —
  * `TextAnalysis.WinnowMod` rationale), packed as
  * `h1 | h2<<30 | (h3&7)<<60`. Every intermediate stays inside
  * overflow-checked non-negative BIGINT arithmetic, which is what lets
  * the DuckDB oracle recompute fingerprints EXACTLY and brute-force the
  * near-dup pair set ([[graft.operators.Dedup.simhashPairsSql]]) — the
  * previous `xxhash64` token hash was inexpressible there, leaving both
  * SimHash tiers rows-only-checked. A prime modulus (not 2³⁰) matters:
  * mod a power of two, bit 0 of EVERY odd-base polynomial hash is the
  * parity of the code-point sum, so the three hashes' low bits would be
  * perfectly correlated and the fingerprint would lose effective bits.
  *
  * Bit 63 is structurally 0 (7·2⁶⁰ + (Mod−1)·2³⁰ + Mod−1 < 2⁶³), so
  * fingerprints are non-negative in both engines and the oracle never
  * needs the `1<<63` shift DuckDB rejects. A constant bit is invisible to
  * Hamming distance, so the banding pigeonhole guarantees are unchanged.
  *
  * Replaces the round-7 `SimHashAggregator` (explode tokens → xxhash64 →
  * groupByKey bit-histogram): the per-document loop below runs inside a
  * map-only typed map, so the token explode AND the groupByKey shuffle
  * disappear from the plan entirely — per-doc SimHash is embarrassingly
  * parallel, the right shape at 100 TB.
  */
object SimHash {
  /** The shared portable family's constants ([[PolyHash]]) — re-exposed
    * here because the oracle builders single-source them from this
    * object's fingerprint contract. */
  val Mod = PolyHash.Mod
  val BaseA = PolyHash.BaseA
  val BaseB = PolyHash.BaseB
  val BaseC = PolyHash.BaseC

  /** Fingerprint width. Bit 63 is structurally 0 — see class doc. */
  val Bits = 64

  /** Token hash: bits 0–29 ← h1, bits 30–59 ← h2, bits 60–62 ← h3&7.
    * Iterates CODE POINTS (surrogate pairs hash as one symbol), matching
    * the oracle's `regexp_split_to_array(tok, '')` + `ascii()`. */
  def tokenHash(tok: String): Long = {
    var h1 = 0L; var h2 = 0L; var h3 = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h1 = (h1 * BaseA + cp) % Mod
      h2 = (h2 * BaseB + cp) % Mod
      h3 = (h3 * BaseC + cp) % Mod
      i += Character.charCount(cp)
    }
    h1 | (h2 << 30) | ((h3 & 7L) << 60)
  }

  /** SimHash over single-space-split tokens, empty tokens dropped (the
    * `string_split(text, ' ')` + `len(tok) > 0` twin): bit j is 1 iff
    * STRICTLY more tokens have hash bit j set than clear (ties → 0, the
    * aggregator semantics DedupSpec pins vs brute force). A document with
    * no tokens fingerprints to 0. */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](Bits)
    val n = text.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = tokenHash(text.substring(start, i))
          var j = 0
          while (j < Bits) {
            votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
