package graft.core

/** In-memory HNSW graph (Malkov & Yashunin 2016, "Efficient and robust
  * approximate nearest neighbor search using Hierarchical Navigable Small
  * World graphs") over QUANTIZED int64 vectors — the high-recall/low-latency
  * serving index the IVF family doesn't cover (SURVEY §2 stretch; upstream
  * has no graph index either — this is the training-pipeline extension).
  *
  * Spark deployment shape (see Similarity.hnswTopK): one graph per SHARD
  * built inside mapPartitions — the per-segment-HNSW layout Lucene/Elastic
  * use — so build memory is bounded by the shard, the graph never crosses
  * the wire, and a query fans out to all shards and merges per-shard top-k
  * through the bounded k-heap. Nothing here touches the driver.
  *
  * Numeric contract: distances are exact int64 squared-L2 on the shared
  * quantized grid (dim 64 × (2e6)² ≈ 2.6e14 << 2^63) — identical ranking
  * metric to [[graft.operators.Similarity.topKL2]], which is the exact twin
  * every recall gate compares against. Determinism: the level of element i
  * comes from a splitmix avalanche of its GLOBAL id (not an RNG), and
  * callers insert in ascending-id order, so a shard's graph is a pure
  * function of its id set regardless of task scheduling.
  *
  * Complexity: insert/search are O(ef·M·log n) distance evaluations; the
  * whole build is O(n·ef_construction·M·log n) per shard — independent of
  * corpus size given fixed shard rows, which is what makes the sharded
  * layout the 10^12 shape (shards scale out, per-shard cost is constant).
  */
final class Hnsw(val dim: Int, val m: Int = 16, val efConstruction: Int = 100) {
  require(m >= 2 && efConstruction >= m, "need m >= 2, efConstruction >= m")
  private val mmax0 = 2 * m // level-0 degree bound (the paper's Mmax0)
  private val mL = 1.0 / math.log(m.toDouble)

  private var n = 0
  private var ids = new Array[Long](16)
  private var vecs = new Array[Long](16 * dim)
  private var levels = new Array[Int](16)
  /** neighbors(node) = per-level adjacency, each an int array of node
    * indices padded with -1 (allocated at the level's degree bound).
    */
  private var neighbors = new Array[Array[Array[Int]]](16)
  private var entryPoint = -1
  private var maxLevel = -1

  def size: Int = n
  def idAt(i: Int): Long = ids(i)

  /** Deterministic level from the global id: u ∈ (0,1) via splitmix, then
    * the paper's floor(−ln(u)·mL), capped at 30.
    */
  def levelFor(id: Long): Int = {
    var z = id * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    val u = ((z >>> 11) + 1).toDouble / (1L << 53).toDouble // (0, 1]
    math.min(30, math.floor(-math.log(u) * mL).toInt)
  }

  @inline private def d2(i: Int, q: Array[Long]): Long = {
    var s = 0L
    var k = 0
    val off = i * dim
    while (k < dim) { val d = vecs(off + k) - q(k); s += d * d; k += 1 }
    s
  }

  private def grow(): Unit = if (n == ids.length) {
    val cap = n * 2
    ids = java.util.Arrays.copyOf(ids, cap)
    vecs = java.util.Arrays.copyOf(vecs, cap * dim)
    levels = java.util.Arrays.copyOf(levels, cap)
    neighbors = java.util.Arrays.copyOf(neighbors, cap)
  }

  /** Greedy 1-best descent at `level` from `ep` — the upper-layer hop. */
  private def greedyStep(q: Array[Long], ep: Int, level: Int): Int = {
    var cur = ep
    var curD = d2(cur, q)
    var improved = true
    while (improved) {
      improved = false
      val adj = neighbors(cur)(level)
      var i = 0
      while (i < adj.length && adj(i) >= 0) {
        val cd = d2(adj(i), q)
        if (cd < curD) { cur = adj(i); curD = cd; improved = true }
        i += 1
      }
    }
    cur
  }

  /** Best-first beam search at `level` (the paper's SEARCH-LAYER): returns
    * up to `ef` (d2, idx) pairs, ascending.
    */
  private def searchLayer(q: Array[Long], ep: Int, ef: Int, level: Int): Array[Array[Long]] = {
    val visited = new java.util.BitSet(n)
    // candidates: min-heap by distance; results: bounded max-heap (KnnHeap
    // ordering idiom — non-negative longs, raw compare is order-correct)
    val cand = new java.util.PriorityQueue[Array[Long]](ef, (a: Array[Long], b: Array[Long]) =>
      java.lang.Long.compare(a(0), b(0)))
    val res = new java.util.PriorityQueue[Array[Long]](ef, (a: Array[Long], b: Array[Long]) =>
      java.lang.Long.compare(b(0), a(0)))
    val d0 = d2(ep, q)
    visited.set(ep)
    cand.add(Array(d0, ep))
    res.add(Array(d0, ep))
    while (!cand.isEmpty) {
      val c = cand.poll()
      if (c(0) > res.peek()(0) && res.size >= ef) {
        cand.clear() // every remaining candidate is farther than the worst kept
      } else {
        val adj = neighbors(c(1).toInt)(level)
        var i = 0
        while (i < adj.length && adj(i) >= 0) {
          val e = adj(i)
          if (!visited.get(e)) {
            visited.set(e)
            val ed = d2(e, q)
            if (res.size < ef || ed < res.peek()(0)) {
              cand.add(Array(ed, e))
              res.add(Array(ed, e))
              if (res.size > ef) res.poll()
            }
          }
          i += 1
        }
      }
    }
    val out = new Array[Array[Long]](res.size)
    res.toArray(out)
    java.util.Arrays.sort(out, (a: Array[Long], b: Array[Long]) => {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(a(1), b(1))
    })
    out
  }

  /** The paper's Algorithm 4 neighbor-selection heuristic: keep a candidate
    * only if it is closer to the base than to every already-kept neighbor —
    * preserves graph connectivity across cluster gaps, which plain
    * closest-M loses (recall collapses on clustered corpora).
    */
  private def selectHeuristic(cands: Array[Array[Long]], k: Int): Array[Int] = {
    val kept = new Array[Int](math.min(k, cands.length))
    var nk = 0
    var i = 0
    while (i < cands.length && nk < k) {
      val e = cands(i)(1).toInt
      val eOff = e * dim
      var ok = true
      var j = 0
      while (ok && j < nk) {
        // d(e, kept(j)) < d(e, base) ⇒ e is "shadowed" by kept(j)
        var s = 0L
        var t = 0
        val kOff = kept(j) * dim
        while (t < dim) { val d = vecs(eOff + t) - vecs(kOff + t); s += d * d; t += 1 }
        if (s < cands(i)(0)) ok = false
        j += 1
      }
      if (ok) { kept(nk) = e; nk += 1 }
      i += 1
    }
    // backfill with closest skipped if the heuristic kept < k (paper's
    // keepPrunedConnections) — degree bounds matter more than purity here
    if (nk < kept.length) {
      i = 0
      while (i < cands.length && nk < kept.length) {
        val e = cands(i)(1).toInt
        var dup = false
        var j = 0
        while (j < nk) { if (kept(j) == e) dup = true; j += 1 }
        if (!dup) { kept(nk) = e; nk += 1 }
        i += 1
      }
    }
    if (nk == kept.length) kept else java.util.Arrays.copyOf(kept, nk)
  }

  private def linkInto(node: Int, level: Int, targets: Array[Int]): Unit = {
    val bound = if (level == 0) mmax0 else m
    val adj = new Array[Int](bound)
    java.util.Arrays.fill(adj, -1)
    var i = 0
    while (i < targets.length && i < bound) { adj(i) = targets(i); i += 1 }
    neighbors(node)(level) = adj
  }

  /** Add `node` into `target`'s adjacency at `level`, pruning back to the
    * degree bound with the same heuristic when full.
    */
  private def connectBack(target: Int, node: Int, level: Int): Unit = {
    val bound = if (level == 0) mmax0 else m
    val adj = neighbors(target)(level)
    var i = 0
    while (i < adj.length) {
      if (adj(i) == -1) { adj(i) = node; return }
      i += 1
    }
    // full: re-select the best `bound` among existing + new, by distance
    val tOff = target * dim
    val all = new Array[Array[Long]](adj.length + 1)
    var j = 0
    while (j < adj.length) {
      var s = 0L; var t = 0; val o = adj(j) * dim
      while (t < dim) { val d = vecs(tOff + t) - vecs(o + t); s += d * d; t += 1 }
      all(j) = Array(s, adj(j)); j += 1
    }
    var s2 = 0L; var t2 = 0; val nOff = node * dim
    while (t2 < dim) { val d = vecs(tOff + t2) - vecs(nOff + t2); s2 += d * d; t2 += 1 }
    all(adj.length) = Array(s2, node)
    java.util.Arrays.sort(all, (a: Array[Long], b: Array[Long]) => {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(a(1), b(1))
    })
    linkInto(target, level, selectHeuristic(all, bound))
  }

  /** Deserialization backdoor: append a node with its saved level and
    * adjacency verbatim (no search, no re-linking).
    */
  private[core] def restore(id: Long, vec: Array[Long], lvl: Int,
                            adj: Array[Array[Int]]): Unit = {
    grow()
    ids(n) = id
    System.arraycopy(vec, 0, vecs, n * dim, dim)
    levels(n) = lvl
    neighbors(n) = adj
    n += 1
  }

  private[core] def restoreEntry(ep: Int, maxL: Int): Unit = {
    entryPoint = ep; maxLevel = maxL
  }

  def insert(id: Long, vec: Array[Long]): Unit = {
    require(vec.length == dim, s"dim mismatch: ${vec.length} vs $dim")
    grow()
    val node = n
    ids(node) = id
    System.arraycopy(vec, 0, vecs, node * dim, dim)
    val lvl = levelFor(id)
    levels(node) = lvl
    neighbors(node) = new Array[Array[Int]](lvl + 1)
    var l = 0
    while (l <= lvl) { linkInto(node, l, Array.emptyIntArray); l += 1 }
    n += 1

    if (entryPoint < 0) { entryPoint = node; maxLevel = lvl; return }

    var ep = entryPoint
    // descend levels above lvl greedily
    var level = maxLevel
    while (level > lvl) { ep = greedyStep(vec, ep, level); level -= 1 }
    // insert at each level from min(maxLevel, lvl) down to 0
    level = math.min(maxLevel, lvl)
    while (level >= 0) {
      val w = searchLayer(vec, ep, efConstruction, level)
      val bound = if (level == 0) mmax0 else m
      val sel = selectHeuristic(w, math.min(m, bound))
      linkInto(node, level, sel)
      var i = 0
      while (i < sel.length) { connectBack(sel(i), node, level); i += 1 }
      if (w.nonEmpty) ep = w(0)(1).toInt
      level -= 1
    }
    if (lvl > maxLevel) { maxLevel = lvl; entryPoint = node }
  }

  /** Top-k (globalId, d2) pairs ascending by (d2, id); `ef >= k` is the
    * recall/latency knob (the paper's efSearch).
    */
  def search(q: Array[Long], k: Int, ef: Int): Array[(Long, Long)] = {
    if (n == 0) return Array.empty
    var ep = entryPoint
    var level = maxLevel
    while (level > 0) { ep = greedyStep(q, ep, level); level -= 1 }
    val w = searchLayer(q, ep, math.max(ef, k), 0)
    w.take(k).map(e => (ids(e(1).toInt), e(0)))
  }

  /** Serialize the whole graph (vectors + adjacency) — the persisted-index
    * payload. ~(8·dim + 4·(2m + m·levels) + 16) bytes per node; callers
    * chunk the byte array for storage (a 1M-node 64-dim shard is ~700 MB —
    * size shards accordingly).
    */
  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(n * (dim * 8 + 64) + 64)
    val out = new java.io.DataOutputStream(new java.util.zip.DeflaterOutputStream(
      bos, new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)))
    out.writeInt(0x484E5357) // "HNSW"
    out.writeInt(1)
    out.writeInt(dim); out.writeInt(m); out.writeInt(efConstruction)
    out.writeInt(n); out.writeInt(entryPoint); out.writeInt(maxLevel)
    var i = 0
    while (i < n) {
      out.writeLong(ids(i)); out.writeInt(levels(i))
      var k = 0
      while (k < dim) { out.writeLong(vecs(i * dim + k)); k += 1 }
      var l = 0
      while (l <= levels(i)) {
        val adj = neighbors(i)(l)
        out.writeInt(adj.length)
        var j = 0
        while (j < adj.length) { out.writeInt(adj(j)); j += 1 }
        l += 1
      }
      i += 1
    }
    out.close()
    bos.toByteArray
  }
}

object Hnsw {
  /** Rebuild a graph from [[Hnsw.serialize]] bytes — node order, adjacency
    * and entry point restored verbatim (NOT re-inserted), so a deserialized
    * graph answers queries identically to the one that was saved.
    */
  def deserialize(bytes: Array[Byte]): Hnsw = {
    val in = new java.io.DataInputStream(new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    require(in.readInt() == 0x484E5357, "not an HNSW payload")
    require(in.readInt() == 1, "unknown HNSW payload version")
    val dim = in.readInt(); val m = in.readInt(); val efC = in.readInt()
    val n = in.readInt(); val ep = in.readInt(); val maxL = in.readInt()
    val g = new Hnsw(dim, m, efC)
    var i = 0
    while (i < n) {
      val id = in.readLong(); val lvl = in.readInt()
      val vec = new Array[Long](dim)
      var k = 0
      while (k < dim) { vec(k) = in.readLong(); k += 1 }
      val adj = new Array[Array[Int]](lvl + 1)
      var l = 0
      while (l <= lvl) {
        val len = in.readInt()
        val a = new Array[Int](len)
        var j = 0
        while (j < len) { a(j) = in.readInt(); j += 1 }
        adj(l) = a
        l += 1
      }
      g.restore(id, vec, lvl, adj)
      i += 1
    }
    in.close()
    g.restoreEntry(ep, maxL)
    g
  }
}
