package graft.core

/** Deterministic integer text-hashing kernels for the training-data pipeline
  * operators (dedup, near-dup, fingerprinting). Everything is modular int64
  * arithmetic over a prime < 2^31, chosen so the SAME formula is expressible
  * in ANSI SQL / DuckDB without overflow (products stay < 2^62) — the DuckDB
  * oracle twins re-derive these values from the raw text, so parity is
  * end-to-end, not a fixture.
  *
  * Spark-side these run inside codegen'd Catalyst expressions
  * (graft.functions.TextExpressions); the ScalaTest oracles call the same
  * statics — one kernel, three consumers.
  */
object TextHash {
  val P: Long = 1000000007L
  val SEED: Long = 7L
  val BASE: Long = 31L

  /** Polynomial rolling hash over UTF-16 code units:
    * acc = (acc*31 + c) mod P, acc0 = 7. DuckDB twin:
    * list_reduce(list_prepend(7, list_transform(string_split(s,''), x ->
    * unicode(x))), (acc,c) -> (acc*31+c) % 1000000007).
    * (Fixture text is ASCII, so code-unit vs code-point agree.)
    */
  def charHash(s: String): Long = {
    var acc = SEED
    var i = 0
    while (i < s.length) {
      acc = (acc * BASE + s.charAt(i)) % P
      i += 1
    }
    acc
  }

  /** Second independent rolling hash (different base/seed, same prime) —
    * paired with [[charHash]] wherever ~30 bits is not enough: the combined
    * 60-bit key `charHash·P + charHash2` drops the birthday-collision rate
    * from ~1 false merge per 45k distinct docs to ~1 per 1.5e9 (still
    * ANSI-expressible: every product stays < 2^62).
    */
  val BASE2: Long = 37L
  val SEED2: Long = 11L
  def charHash2(s: String): Long = {
    var acc = SEED2
    var i = 0
    while (i < s.length) {
      acc = (acc * BASE2 + s.charAt(i)) % P
      i += 1
    }
    acc
  }

  /** Combined 60-bit content key (see [[charHash2]]). */
  @inline def charHash64(s: String): Long = charHash(s) * P + charHash2(s)

  /** MinHash signature over a token/shingle set: sig(i) = min over shingles x
    * of (a_i·h(x) + b_i) mod P, with (a_i, b_i) from a fixed LCG — Spark-side
    * only (the oracle for LSH output is the brute-force exact-Jaccard SQL).
    */
  val MINHASH_K = 32
  private val lcg: Array[Long] = {
    var s = 88172645463325252L
    Array.fill(2 * MINHASH_K) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      math.abs(s % (P - 1)) + 1
    }
  }
  def minhashSig(shingleHashes: Array[Long]): Array[Long] = {
    val sig = Array.fill(MINHASH_K)(Long.MaxValue)
    var j = 0
    while (j < shingleHashes.length) {
      val h = shingleHashes(j)
      var i = 0
      while (i < MINHASH_K) {
        val v = (lcg(2 * i) * h + lcg(2 * i + 1)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 31-bit SimHash over token hashes WITH multiplicity: bit j is 1 iff
    * Σ_tokens (bit j of charHash(token) ? +1 : −1) ≥ 0. 31 bits keeps every
    * intermediate in int64 AND makes the whole formula ANSI-expressible
    * (the DuckDB twin is a generated 31-term expression).
    */
  val SIMHASH_BITS = 31
  def simhash(tokenHashes: Array[Long]): Long = {
    val acc = new Array[Int](SIMHASH_BITS)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var j = 0
      while (j < SIMHASH_BITS) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < SIMHASH_BITS) {
      if (acc(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** 62-bit SimHash: two independent 31-bit SimHashes (token hashes from
    * charHash and charHash2 respectively) concatenated — bits 0..30 from the
    * first, 31..61 from the second. Hamming distance over the 62 bits is the
    * sum of the halves' distances, so band-pigeonhole recall guarantees
    * carry over unchanged, while the wider code kills the 31-bit version's
    * ~2^8-distinct-values-per-band degeneracy at corpus scale (band keys now
    * span 2^15-2^16 values). Still ANSI-expressible (62 generated terms,
    * everything < 2^62).
    */
  val SIMHASH64_BITS = 2 * SIMHASH_BITS
  def simhash64(tokenHashes1: Array[Long], tokenHashes2: Array[Long]): Long =
    simhash(tokenHashes1) | (simhash(tokenHashes2) << SIMHASH_BITS)

  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
