package graft.core

/** SpaceSaving heavy-hitters summary (Metwally-Agrawal-El Abbadi 2005,
  * public algorithm; merge per Agarwal et al. "Mergeable Summaries"):
  * at most `k` counters; an unseen item evicts the minimum counter and
  * inherits its count as overestimation error. Guarantees with n items
  * processed: every item with true frequency > n/k is present, and
  * est ∈ [true, true + err] — ONE-SIDED, preserved across [[merge]]:
  * an item absent from a full summary has true count ≤ that summary's
  * minimum counter there, so merge adds the other side's min counter to
  * one-sided-absent items before truncating to the k largest (the standard
  * mergeable-summaries fix — a plain union-sum-truncate would UNDERcount
  * items tracked in only one summary). `err` sums the per-side bounds, so
  * post-merge it can reach Σ nᵢ/k over the merged inputs (spec-gated).
  *
  * The corpus-scale path for vocabulary / top-token statistics: exact
  * word counting shuffles every distinct token; this aggregates to a
  * k-entry summary per group with map-side partials.
  */
final class SpaceSaving(val k: Int) extends Serializable {
  require(k >= 1)
  // item -> (count, error)
  private[core] val counters = new java.util.HashMap[String, Array[Long]]()
  var n: Long = 0L

  def insert(x: String): Unit = { add(x, 1L, 0L); n += 1 }

  private def add(x: String, c: Long, err: Long): Unit = {
    val cur = counters.get(x)
    if (cur != null) { cur(0) += c; cur(1) += err }
    else if (counters.size < k) counters.put(x, Array(c, err))
    else {
      // evict the minimum-count entry; the newcomer inherits its count
      // as an upper bound on what it could have accumulated unseen
      var minKey: String = null
      var minCnt = Long.MaxValue
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minCnt ||
            (e.getValue()(0) == minCnt && (minKey == null || e.getKey < minKey))) {
          minCnt = e.getValue()(0); minKey = e.getKey
        }
      }
      counters.remove(minKey)
      counters.put(x, Array(minCnt + c, minCnt + err))
    }
  }

  /** Minimum counter value IF the summary is at capacity (an item absent
    * from a full summary has true count ≤ this); 0 when under capacity
    * (absence then means true count 0).
    */
  private def minCount: Long = {
    if (counters.size < k) return 0L
    var m = Long.MaxValue
    val it = counters.values().iterator()
    while (it.hasNext) { val v = it.next()(0); if (v < m) m = v }
    m
  }

  /** Merge another summary in: items in both sum; items in only one side
    * gain the OTHER side's min counter (count upper bound for an item the
    * other summary silently absorbed), then truncate to the k largest —
    * keeps est ≥ true through arbitrary merge trees (Agarwal et al.).
    */
  def merge(other: SpaceSaving): Unit = {
    val m1 = minCount       // this side's bound, BEFORE mutation
    val m2 = other.minCount // other side's bound
    val onlyThis = new java.util.HashSet[String](counters.keySet())
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counters.get(e.getKey)
      if (cur != null) {
        cur(0) += e.getValue()(0); cur(1) += e.getValue()(1)
        onlyThis.remove(e.getKey)
      } else counters.put(e.getKey,
        Array(e.getValue()(0) + m1, e.getValue()(1) + m1))
    }
    if (m2 > 0L) {
      val oit = onlyThis.iterator()
      while (oit.hasNext) {
        val cur = counters.get(oit.next())
        cur(0) += m2; cur(1) += m2
      }
    }
    n += other.n
    if (counters.size > k) {
      val entries = new Array[(String, Array[Long])](counters.size)
      val it2 = counters.entrySet().iterator()
      var i = 0
      while (it2.hasNext) { val e = it2.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
      // keep the k largest by (count, key) — deterministic
      val sorted = entries.sortBy { case (key, v) => (-v(0), key) }
      counters.clear()
      var j = 0
      while (j < k) { counters.put(sorted(j)._1, sorted(j)._2); j += 1 }
    }
  }

  /** (item, estimated count, max overestimation) sorted by count desc then
    * item — deterministic output order.
    */
  def topK(m: Int): Array[(String, Long, Long)] = {
    val out = new Array[(String, Long, Long)](counters.size)
    val it = counters.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1 }
    out.sortBy { case (key, c, _) => (-c, key) }.take(m)
  }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(k); out.writeLong(n); out.writeInt(counters.size)
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush(); bos.toByteArray
  }
}

object SpaceSaving {
  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new SpaceSaving(in.readInt())
    s.n = in.readLong()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      s.counters.put(in.readUTF(), Array(in.readLong(), in.readLong()))
      i += 1
    }
    s
  }
}
