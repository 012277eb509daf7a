package graft.core

/** KLL-style mergeable quantile sketch over doubles (Karnin-Lang-Liberty,
  * FOCS'16 — public algorithm; upstream OSHDB uses a t-digest for
  * `estimatedQuantiles`, same mergeable-sketch role).
  *
  * Structure: a stack of buffers; items in level i carry weight 2^i. Inserts
  * land in level 0; a full level is COMPACTED — sorted, then every other
  * item promoted to the next level (the dropped half's weight is represented
  * by the survivors' doubled weight). Level capacities shrink geometrically
  * below the top (c^(depth-1-i)·k, c = 2/3), giving O(k·log(n/k)) space and
  * uniform rank error O(1/k) with small constants.
  *
  * Determinism: the classic algorithm flips a coin for the compaction
  * offset; this implementation alternates the offset per level
  * (`flip(i)`), which keeps results bit-reproducible across identical
  * partition layouts while preserving the "each half survives equally
  * often" property the error analysis needs. Error bounds are asserted
  * empirically in KllSpec (rank error vs exact percentile, including the
  * merge path) rather than assumed.
  *
  * Mergeable: `merge` concatenates level-wise then restores capacities —
  * the algebraic property Spark's partial aggregation needs
  * (map-side partial sketches + reduce-side merge, no per-group value
  * buffering — the exact `percentile` buffers every value per group, which
  * is memory-hostile for billion-row groups).
  */
final class KllSketch(val k: Int) extends Serializable {
  require(k >= 8, "k >= 8")
  private[core] var levels: Array[Array[Double]] = Array(Array.empty[Double])
  private[core] var sizes: Array[Int] = Array(0)
  private[core] var level0: Array[Double] = new Array[Double](capacity(0, 1))
  var count: Long = 0L
  private[core] var flips: Long = 0L

  private def capacity(level: Int, depth: Int): Int = {
    // top level holds k; each level below 2/3 of the one above, floor 8
    var c = k.toDouble
    var i = depth - 1
    while (i > level) { c = c * 2.0 / 3.0; i -= 1 }
    math.max(8, math.ceil(c).toInt)
  }

  def insert(v: Double): Unit = {
    if (sizes(0) >= level0.length) compact(0)
    if (sizes(0) >= level0.length) level0 = java.util.Arrays.copyOf(level0, level0.length * 2)
    level0(sizes(0)) = v
    sizes(0) += 1
    count += 1
  }

  private def bufferAt(i: Int): Array[Double] = if (i == 0) level0 else levels(i)

  /** Sort level i, promote alternating items to level i+1, clear level i. */
  private def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) {
      levels = levels :+ Array.empty[Double]
      sizes = sizes :+ 0
      // deeper stack ⇒ lower levels get smaller caps; shrink level0 lazily
    }
    val buf = bufferAt(i)
    val n = sizes(i)
    if (n < 2) return
    java.util.Arrays.sort(buf, 0, n)
    val offset = (flips >> i & 1L).toInt // alternate halves deterministically
    flips += (1L << i)
    val promoted = (offset until n by 2).map(j => buf(j)).toArray
    // append to level i+1
    val upN = sizes(i + 1)
    val up = new Array[Double](upN + promoted.length)
    if (upN > 0) System.arraycopy(levels(i + 1), 0, up, 0, upN)
    System.arraycopy(promoted, 0, up, upN, promoted.length)
    levels(i + 1) = up
    sizes(i + 1) = up.length
    sizes(i) = 0
    if (i == 0) level0 = new Array[Double](math.max(capacity(0, levels.length), 8))
    if (sizes(i + 1) >= capacity(i + 1, levels.length) * 2) compact(i + 1)
  }

  def merge(other: KllSketch): Unit = {
    var i = 0
    while (i < other.levels.length) {
      val on = other.sizes(i)
      if (on > 0) {
        while (i >= levels.length) { levels = levels :+ Array.empty[Double]; sizes = sizes :+ 0 }
        val src = other.bufferAt(i)
        if (i == 0) {
          var j = 0
          while (j < on) { insert(src(j)); count -= 1; j += 1 } // count fixed below
        } else {
          val n0 = sizes(i)
          val merged = new Array[Double](n0 + on)
          if (n0 > 0) System.arraycopy(bufferAt(i), 0, merged, 0, n0)
          System.arraycopy(src, 0, merged, n0, on)
          levels(i) = merged
          sizes(i) = merged.length
          if (sizes(i) >= capacity(i, levels.length) * 2) compact(i)
        }
      }
      i += 1
    }
    count += other.count
  }

  /** Weighted-rank quantile: the value whose cumulative weight first reaches
    * q·W (q in [0,1]); NaN on an empty sketch.
    */
  def quantile(q: Double): Double = {
    if (count == 0L) return Double.NaN
    var total = 0L
    var m = 0
    var i = 0
    while (i < levels.length) { total += sizes(i).toLong << i; m += sizes(i); i += 1 }
    val vs = new Array[Double](m)
    val ws = new Array[Long](m)
    var p = 0
    i = 0
    while (i < levels.length) {
      val buf = bufferAt(i)
      var j = 0
      while (j < sizes(i)) { vs(p) = buf(j); ws(p) = 1L << i; p += 1; j += 1 }
      i += 1
    }
    // indirect sort by value
    val idx = (0 until m).sortBy(j => vs(j))
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var r = 0
    while (r < m) {
      cum += ws(idx(r))
      if (cum >= target) return vs(idx(r))
      r += 1
    }
    vs(idx(m - 1))
  }

  def serialize(): Array[Byte] = {
    val m = sizes.sum
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + levels.length * 4 + m * 8)
    bb.putInt(k).putLong(count).putLong(flips).putInt(levels.length)
    var i = 0
    while (i < levels.length) { bb.putInt(sizes(i)); i += 1 }
    i = 0
    while (i < levels.length) {
      val buf = bufferAt(i)
      var j = 0
      while (j < sizes(i)) { bb.putDouble(buf(j)); j += 1 }
      i += 1
    }
    bb.array()
  }
}

object KllSketch {
  def deserialize(bytes: Array[Byte]): KllSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new KllSketch(bb.getInt)
    s.count = bb.getLong
    val flips = bb.getLong
    val nLevels = bb.getInt
    val sizes = Array.fill(nLevels)(bb.getInt)
    val levels = sizes.map(n => Array.fill(n)(bb.getDouble))
    // restore: level 0 into its insert buffer, rest verbatim
    s.levels = levels.zipWithIndex.map { case (a, i) => if (i == 0) Array.empty[Double] else a }
    s.sizes = sizes.clone()
    s.flips = flips
    val buf0 = new Array[Double](math.max(8, sizes(0)))
    System.arraycopy(levels(0), 0, buf0, 0, sizes(0))
    s.level0 = buf0
    s
  }
}
