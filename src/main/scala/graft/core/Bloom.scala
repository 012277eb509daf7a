package graft.core

/** Mergeable Bloom filter over 64-bit keys — the approximate-membership
  * primitive behind the corpus-at-rest dedup verb (`Dedup.bloomNew`): a new
  * ingestion batch is checked against an existing corpus WITHOUT shuffling
  * the corpus, because the filter (not the keyset) travels to the batch.
  * Classic structure (Bloom 1970; Putze et al. 2007 for the blocked/bucketed
  * deployment shape — public knowledge).
  *
  * Guarantees (both spec-gated in BloomSpec):
  *   - NO false negatives: every inserted key probes true, across any
  *     merge tree (merge = bitwise OR, commutative/associative/idempotent —
  *     safe under Spark's map-side partial aggregation and retries);
  *   - false-positive rate ≈ (1 − e^(−kn/m))^k for n keys, m bits, k probes
  *     — sized by the caller via bits-per-key (16 bits/key, k=7 → ~4e−4).
  *
  * Probe indices derive from two rounds of the splitmix64 finalizer
  * (Steele et al. 2014, public) + Kirsch–Mitzenmacher double hashing
  * h_i = h1 + i·h2 — fully deterministic, no RNG state, identical on every
  * executor and across runs (the same content-addressing discipline as
  * `TextAnalysis.hashBucket`).
  *
  * Wire format (BloomAgg's BinaryType output): [numBits:int][numHashes:int]
  * [words:long×numBits/64], big-endian. `Bloom.probe` reads the header and
  * tests bits DIRECTLY on the byte array — the batch-side join probes the
  * broadcast bloom column with zero deserialization or per-row allocation.
  */
final class Bloom(val numBits: Int, val numHashes: Int) extends Serializable {
  require(numBits >= 64 && (numBits & 63) == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 32)

  val words = new Array[Long](numBits >>> 6)

  def put(key: Long): Unit = {
    val h1 = Bloom.mix(key)
    val h2 = Bloom.mix(key ^ Bloom.GOLDEN) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      words(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val h1 = Bloom.mix(key)
    val h2 = Bloom.mix(key ^ Bloom.GOLDEN) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise OR — requires identical geometry (same m, k on both sides). */
  def merge(other: Bloom): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"bloom geometry mismatch: ($numBits,$numHashes) vs (${other.numBits},${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object Bloom {
  val GOLDEN: Long = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — deterministic 64-bit avalanche. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def deserialize(bytes: Array[Byte]): Bloom = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Bloom(bb.getInt(), bb.getInt())
    var i = 0
    while (i < b.words.length) { b.words(i) = bb.getLong(); i += 1 }
    b
  }

  /** Zero-copy probe against the SERIALIZED form — the per-row hot path of
    * the batch-side join (no Bloom object, no array copy; reads the two
    * header ints + k longs straight off the byte array).
    */
  def probe(bytes: Array[Byte], key: Long): Boolean = {
    val numBits = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val numHashes = ((bytes(4) & 0xff) << 24) | ((bytes(5) & 0xff) << 16) |
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val h1 = mix(key)
    val h2 = mix(key ^ GOLDEN) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      val byteOff = 8 + ((idx >>> 6) << 3) + (7 - ((idx & 63) >>> 3))
      if (((bytes(byteOff) >> (idx & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  /** Geometry for `expectedKeys` at `bitsPerKey` density: numBits rounded up
    * to a multiple of 64 with a 64-bit floor (never a degenerate filter).
    */
  def sizeFor(expectedKeys: Long, bitsPerKey: Int): Int = {
    val raw = math.min(expectedKeys * bitsPerKey.toLong, (Int.MaxValue - 63).toLong)
    (((math.max(raw, 64L) + 63L) >>> 6) << 6).toInt
  }
}
