package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search for training-data pipelines: brute-force
  * top-k as the exact baseline, hyperplane-LSH bucketing as the
  * approximate scale path, and cosine near-dup pair detection.
  *
  * Numeric contract: every ranking metric is computed on QUANTIZED
  * embeddings — `q[i] = floor(x[i]·1e6 + 0.5)` as int64 — so dot products
  * and squared norms are exact integers (64 dims × (1e6·float)² ≈ 6.4e13
  * << 2^63) and rankings are bit-reproducible across engines; the DuckDB
  * twin reproduces them from the raw float column. Doubles appear only in
  * the final cosine comparison, as products of exactly-representable
  * integers (deterministic IEEE ops in both engines).
  */
object Similarity {

  /** float array → exact int64 quantized array (shared formula). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Exact int64 dot product of two quantized vectors (codegen'd primitive
    * loop — see graft.functions.DotQExpr).
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.TextFunctions.dotQ(a, b)

  /** Brute-force exact top-k by quantized dot product (self excluded,
    * ties → smaller neighbor id). `queries` is broadcast — at scale the
    * query set is the small side by construction; the big side streams
    * through one codegen stage and only (qid, nid, dot) survive to the
    * per-query top-k shuffle.
    */
  def topKDot(points: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    p.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", dotQ(col("pq"), col("qq")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("dot"))
  }

  /** Brute-force exact top-k by quantized L2 distance (self excluded, ties
    * → smaller neighbor id) — the exact reference for the IVF path, which
    * ranks by L2 (the FAISS IndexIVFFlat contract); same broadcast shape as
    * [[topKDot]]. |p−q|² = |p|² − 2p·q + |q|², exact int64.
    */
  def topKL2(points: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int): DataFrame = {
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
      .withColumn("pn2", dotQ(col("pq"), col("pq")))
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"))
      .withColumn("qn2", dotQ(col("qq"), col("qq")))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    p.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("d2", col("pn2") - lit(2L) * dotQ(col("pq"), col("qq")) + col("qn2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("d2"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * an integer in [-1e6, 1e6] from a splitmix-style avalanche — Spark-side
    * only (the ANN result is approximate; its gate is the recall spec, not
    * a SQL oracle).
    */
  def planeComponent(plane: Int, dim: Int): Long = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z % 1000001L)
  }

  /** Hyperplane-LSH ANN: `planes` sign bits → bucket id; candidates =
    * same-bucket pairs across `tables` independent hash tables; exact
    * re-rank inside candidates. Approximate (recall < 1), tested against
    * the brute-force baseline by recall assertion.
    *
    * Scale: buckets partition the corpus — each query probes its own
    * bucket per table, so the join is equi-key and broadcastable on the
    * query side; no all-pairs stage.
    */
  def annTopK(spark: SparkSession, points: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, dims: Int,
              planes: Int = 4, tables: Int = 8): DataFrame = {
    val planeMatrix = Array.tabulate(tables * planes, dims)((pl, d) => planeComponent(pl, d))
    def withBuckets(df: DataFrame, id: String, out: String, vq: String): DataFrame =
      df.select(col(idCol).as(id), quantize(col(vecCol)).as(vq))
        .select(col(id), col(vq), posexplode(
          graft.functions.TextFunctions.hyperplaneBuckets(col(vq), planeMatrix, planes, tables))
          .as(Seq("table", "bucket")))

    val p = withBuckets(points, "nid", "p", "pq")
    val q = withBuckets(queries, "qid", "q", "qq")

    // candidate (qid, nid) pairs dedupe on IDS ONLY — the distinct shuffle
    // carries two longs, not two embeddings; vectors re-join afterwards
    // (query side broadcast, corpus side one hash join on nid)
    val cand = p.join(broadcast(q.select("table", "bucket", "qid")), Seq("table", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val pVec = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
    val qVec = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    cand.join(pVec, Seq("nid")).join(broadcast(qVec), Seq("qid"))
      .withColumn("dot", dotQ(col("pq"), col("qq")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("dot"))
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into inverted
    * lists by nearest centroid (exact integer L2: |p−c|² = |p|² − 2p·c +
    * |c|²); each query probes its `nprobe` nearest centroids' lists and
    * re-ranks candidates exactly.
    *
    * Centroids: a deterministic content-hash sample seeds `lloydRounds`
    * distributed Lloyd (k-means) iterations — assignment is the same
    * nearest-centroid join the index uses, the mean step is one
    * posexplode + groupBy(list, dim) avg, and only nlist×dims aggregated
    * values reach the driver. On clustered corpora k-means centroids track
    * cluster structure, so equal-nprobe recall is strictly higher than the
    * raw hash sample (spec-gated in SimilaritySpec); means are rounded to
    * the integer grid so the index stays integer-exact.
    *
    * Scale: this is the classic big-index layout — lists are the partition
    * key, so a query touches nprobe/nlist of the corpus; centroids are a
    * broadcast table. Centroid selection is a distributed top-`nlist`
    * (TakeOrderedAndProject) — only the ≤nlist centroid rows ever reach
    * the driver, and `nlist = 0` (the default) auto-scales to √n, the
    * classic IVF sizing. (At 10^12 rows √n centroids no longer fit a
    * broadcast — a deployment shards the centroid table and two-stage
    * joins the assignment; the list layout is unchanged.) Approximate
    * (recall gated in SimilaritySpec + the q53 driver bound row).
    */
  def ivfTopK(spark: SparkSession, points: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 0, nprobe: Int = 4, lloydRounds: Int = 2): DataFrame = {
    import spark.implicits._
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
    val numLists =
      if (nlist > 0) nlist
      else math.max(16, math.sqrt(points.count().toDouble).toInt)
    // deterministic distributed sample: top-nlist by content hash — a
    // per-partition heap + driver merge of nlist rows, never a full collect
    var cents: Array[(Any, Array[Long])] =
      p.orderBy(xxhash64(col("nid")), col("nid")).limit(numLists)
        .select(col("nid").as("cid"), col("pq").as("cq"))
        .collect().map(r => (r.get(0), r.getSeq[Long](1).toArray))

    def l2ToCent(vq: Column, cq: Array[Long]): Column = {
      val cLit = array(cq.map(lit): _*)
      // |v|² − 2 v·c + |c|² ; |v|² constant per row ⇒ rank by (−2 v·c + |c|²)
      lit(cq.map(x => x * x).sum) - lit(2L) * dotQ(vq, cLit)
    }
    def nearestCents(df: DataFrame, vq: String, n: Int): DataFrame = {
      val scored = cents.map { case (cid, cq) =>
        struct(l2ToCent(col(vq), cq).as("d"), lit(cid).as("cid"))
      }
      df.withColumn("_cents", array_sort(array(scored: _*)))
        .withColumn("_c", explode(slice(col("_cents"), 1, n)))
        .withColumn("list_id", col("_c.cid")).drop("_cents", "_c")
    }

    // Lloyd refinement: mean of each list's members becomes the centroid;
    // empty lists keep their seed (they stay probeable). Integer rounding
    // collapses sub-ulp summation-order jitter, so assignments are stable.
    for (_ <- 1 to lloydRounds) {
      val means = nearestCents(p, "pq", 1)
        .select(col("list_id"), posexplode(col("pq")).as(Seq("_d", "_v")))
        .groupBy("list_id", "_d").agg(avg(col("_v")).as("_m"))
        .collect()
      val byList = means.groupBy(_.get(0))
      cents = cents.map { case (cid, cq) =>
        byList.get(cid) match {
          case Some(rows) =>
            val nc = cq.clone()
            rows.foreach(r => nc(r.getInt(1)) = Math.round(r.getDouble(2)))
            (cid, nc)
          case None => (cid, cq)
        }
      }
    }

    // L2 metric throughout (lists assigned by L2 ⇒ ranking must be L2 too,
    // the FAISS IndexIVFFlat contract): |p−q|² = |p|² − 2p·q + |q|², exact
    // int64 on quantized vectors
    val lists = nearestCents(p, "pq", 1)
      .withColumn("pn2", dotQ(col("pq"), col("pq")))
    val probes = nearestCents(
      queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq")), "qq", nprobe)
      .withColumn("qn2", dotQ(col("qq"), col("qq")))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    lists.join(broadcast(probes), Seq("list_id"))
      .where(col("qid") =!= col("nid"))
      .withColumn("d2", col("pn2") - lit(2L) * dotQ(col("pq"), col("qq")) + col("qn2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("d2"))
  }

  /** Cosine near-duplicate pairs: cos(a,b) ≥ threshold, evaluated without
    * square roots as dot>0 ∧ dot² ≥ t²·|a|²·|b|² on exact integer inputs
    * (the final comparison is deterministic double arithmetic).
    *
    * Brute force — O(n²) BroadcastNestedLoopJoin. Kept ONLY as the exact
    * recall reference for SimilaritySpec; production paths (q50/q59) go
    * through [[cosineNearDupPairsLsh]].
    */
  def cosineNearDupPairs(points: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val p = points.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotQ(col("q"), col("q")))
    val a = p.select(col("id").as("id_a"), col("q").as("qa"), col("n2").as("na"))
    val b = p.select(col("id").as("id_b"), col("q").as("qb"), col("n2").as("nb"))
    verifyCosine(a.join(b, col("id_a") < col("id_b")), threshold)
  }

  /** dot>0 ∧ dot² ≥ t²·|a|²·|b|² over columns (qa,na,qb,nb) — the shared
    * exact verify for both candidate generators. */
  private def verifyCosine(cands: DataFrame, threshold: Double): DataFrame =
    cands.withColumn("dot", dotQ(col("qa"), col("qb")))
      .where(col("dot") > 0 &&
        col("dot").cast("double") * col("dot").cast("double") >=
          lit(threshold * threshold) * col("na").cast("double") * col("nb").cast("double"))
      .select(col("id_a"), col("id_b"), col("dot"))

  /** Hyperplane-LSH candidate pairs: `tables` independent sign-bit bucket
    * codes of `planes` bits each; candidates = same-(table,bucket) id pairs,
    * distinct'd on ids only (vectors re-joined afterwards — the distinct
    * shuffle carries two longs, not two embeddings). With `maxBucket > 0`,
    * buckets above the cap are dropped (recall trade, logged via the
    * `_bn` filter) — leave 0 for exact-parity paths.
    *
    * Recall math: a pair at cosine t collides in one table with
    * p = (1 − arccos(t)/π)^planes; miss probability after `tables` tables
    * is (1−p)^tables. Defaults (planes=2, tables=24) give miss < 3e-6 at
    * t = 0.45 — measured full recall on the driver corpora (sf0.01/sf0.1)
    * and asserted against brute force in SimilaritySpec. For true near-dup
    * thresholds (t ≥ 0.8, the SemDeDup regime) use planes 8–16 and fewer
    * tables: selectivity per table ≈ 2^−planes of all pairs, so higher
    * `planes` is what makes the join subquadratic at corpus scale; at low
    * thresholds LSH trades ~planes·2^−planes·tables of brute-force work
    * for linear scan amplification — pick parameters per threshold.
    */
  def cosineCandidatesLsh(points: DataFrame, idCol: String, vecCol: String,
                          dims: Int, planes: Int = 2, tables: Int = 24,
                          maxBucket: Long = 0L): DataFrame = {
    val planeMatrix = Array.tabulate(tables * planes, dims)((pl, d) => planeComponent(pl, d))
    val b0 = points
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))
      .select(col("id"), posexplode(
        graft.functions.TextFunctions.hyperplaneBuckets(col("vq"), planeMatrix, planes, tables))
        .as(Seq("table", "bucket")))
    val b =
      if (maxBucket > 0L) {
        val w = Window.partitionBy("table", "bucket")
        b0.withColumn("_bn", count(lit(1)).over(w)).where(col("_bn") <= maxBucket).drop("_bn")
      } else b0
    b.select(col("table"), col("bucket"), col("id").as("id_a"))
      .join(b.select(col("table"), col("bucket"), col("id").as("id_b")), Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact cosine near-dup pairs via a BROADCAST-BLOCKED scan: the
    * quantized corpus (id, q, |q|²) is broadcast once (hard-capped — 200k
    * vectors × 64 dims ≈ 100 MB) and each partition runs a primitive
    * i<j loop emitting ONLY qualifying pairs — no join, no shuffle, no
    * pair-row materialization (the BNLJ brute path allocates an UnsafeRow
    * per pair; this allocates per SURVIVOR). Same shape as
    * Dedup.verifyPairs' broadcast stage.
    *
    * Scale posture, stated plainly: an EXACT threshold join on dense
    * vectors is Θ(n²) dot products — no subquadratic exact algorithm
    * exists, and at thresholds below ~0.7 LSH candidate generation is
    * provably MORE work than all-pairs (per-plane collision gap
    * 1−arccos(t)/π vs 1/2 is too thin: full recall at t=0.45 costs
    * ≥6× brute — measured AND derived in SimilaritySpec docs). So: this
    * path for exact answers on corpora under the cap; [[cosineNearDupPairsLsh]]
    * (subquadratic, documented recall) for corpus-scale near-dup at real
    * thresholds (t ≥ 0.8, the SemDeDup regime).
    */
  def cosineNearDupPairsExact(points: DataFrame, idCol: String, vecCol: String,
                              threshold: Double,
                              maxBroadcastVectors: Long = 200000L): DataFrame = {
    val spark = points.sparkSession
    val p = points.select(col(idCol).cast("long").as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotQ(col("q"), col("q")))
    val n = p.count()
    require(n <= maxBroadcastVectors,
      s"corpus $n exceeds broadcast cap $maxBroadcastVectors — use cosineNearDupPairsLsh")
    val corpus = p.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2))).sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val t2 = threshold * threshold
    import spark.implicits._
    val out = p.select("id", "q", "n2").as[(Long, Array[Long], Long)]
      .mapPartitions { it =>
        val all = bc.value
        val ids = all.map(_._1) // sorted — binary search start-of-suffix
        it.flatMap { case (ida, qa, na) =>
          // emit pairs (ida, idb) with idb > ida only — each pair computed once
          var lo = java.util.Arrays.binarySearch(ids, ida) + 1
          if (lo < 0) lo = -lo // not found → insertion point
          Iterator.range(lo, all.length).flatMap { j =>
            val (idb, qb, nb) = all(j)
            var dot = 0L
            var d = 0
            while (d < qa.length) { dot += qa(d) * qb(d); d += 1 }
            if (dot > 0 &&
                dot.toDouble * dot.toDouble >= t2 * na.toDouble * nb.toDouble)
              Some((ida, idb, dot))
            else None
          }
        }
      }.toDF("id_a", "id_b", "dot")
    out
  }

  /** Cosine near-dup pairs at corpus scale: LSH-bucketed candidates
    * ([[cosineCandidatesLsh]]) + the same exact integer verify as the brute
    * path. Equi-joins only — no cartesian stage anywhere in the plan
    * (asserted in SimilaritySpec). Result is identical to
    * [[cosineNearDupPairs]] whenever candidate recall is full; parameters
    * are chosen so it is on the fixture corpora (see recall math above).
    */
  def cosineNearDupPairsLsh(points: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dims: Int,
                            planes: Int = 2, tables: Int = 24,
                            maxBucket: Long = 0L): DataFrame = {
    val p = points.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotQ(col("q"), col("q")))
    val cands = cosineCandidatesLsh(points, idCol, vecCol, dims, planes, tables, maxBucket)
      .join(p.select(col("id").as("id_a"), col("q").as("qa"), col("n2").as("na")), Seq("id_a"))
      .join(p.select(col("id").as("id_b"), col("q").as("qb"), col("n2").as("nb")), Seq("id_b"))
    verifyCosine(cands, threshold)
  }
}
