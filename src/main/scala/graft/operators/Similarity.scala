package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType, LongType}

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
    * broadcast nearest-centroid kernel the index uses, the mean step
    * aggregates per-partition (count, vector-sum) partials (shuffle and
    * driver collect scale with partitions×nlist×dims, never with n), and
    * training runs on a hash-capped ~[[TRAIN_PER_LIST]]·nlist sample, the
    * FAISS convention. On clustered corpora k-means centroids track
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
  /** @param keep optional ATTRIBUTE FILTER over `points` rows (the FAISS
    *        IDSelector / filtered-vector-search semantics): the index —
    *        centroid training AND list assignment — is built over ALL
    *        points (filter-agnostic, reusable across predicates); the
    *        predicate drops non-matching candidates INSIDE the probed-list
    *        scan, before the rank heap, so results are the exact top-k of
    *        the matching subset within the probed lists. Evaluated once at
    *        scan time into a boolean that rides the list rows — any
    *        attribute expression over the input columns works, no second
    *        pass over the corpus and no id-set join.
    */
  def ivfTopK(spark: SparkSession, points: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 0, nprobe: Int = 4, lloydRounds: Int = 2,
              keep: Column = lit(true)): DataFrame = {
    // persisted: the index build is inherently multi-pass (seeds + one
    // assignment per Lloyd round + the final list assignment) — cache the
    // quantized vectors once instead of re-scanning parquet per pass, and
    // EXPLICITLY unpersist once the final list assignment has materialized
    // (try/finally): repeated index builds in one long session must not pin
    // executor storage memory waiting for the ContextCleaner.
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"),
        keep.as("_keep"))
      .persist()
    try {
      val n = p.count() // also materializes the cache
      val numLists =
        if (nlist > 0) nlist
        else math.max(16, math.sqrt(n.toDouble).toInt)
      val cents = ivfTrain(spark, p, numLists, lloydRounds, nKnown = n)
      val bcFinal = spark.sparkContext.broadcast(cents)
      val lists = withNearestLists(p, "pq", 1, bcFinal)
        .withColumn("pn2", dotQ(col("pq"), col("pq")))
        .localCheckpoint(eager = true) // final assignment runs off the cache NOW
      ivfRank(lists.where(col("_keep")).drop("_keep"),
        ivfProbes(spark, queries, idCol, vecCol, nprobe, bcFinal), k)
    } finally p.unpersist(blocking = false)
  }

  /** Centroid training, shared by the one-shot and persisted-index paths:
    * deterministic content-hash seeds + `lloydRounds` distributed k-means
    * iterations over a hash-capped sample. `p` must be (nid, pq) and
    * persisted by the caller.
    */
  private def ivfTrain(spark: SparkSession, p: DataFrame, numLists: Int,
                       lloydRounds: Int, nKnown: Long = -1L): Array[Array[Long]] = {
    import spark.implicits._
    val n = if (nKnown >= 0) nKnown else p.count()
    // deterministic distributed sample: top-nlist by content hash — a
    // per-partition heap + driver merge of nlist rows, never a full collect.
    // Centroids are identified by ARRAY INDEX from here on (list_id: int) —
    // ids are internal to the index, and primitive ints keep the
    // assignment kernel and the lists⋈probes equi-join allocation-free.
    var cents: Array[Array[Long]] =
      p.orderBy(xxhash64(col("nid")), col("nid")).limit(numLists)
        .select(col("pq")).collect().map(_.getSeq[Long](0).toArray)

    // Lloyd refinement: mean of each list's members becomes the centroid;
    // empty lists keep their seed (they stay probeable). Integer rounding
    // collapses sub-ulp summation-order jitter, so assignments are stable.
    // FAISS-style training cap: k-means only needs a sample to place
    // centroids — train on a deterministic content-hash subset of
    // ~TRAIN_PER_LIST·nlist vectors so the Lloyd passes stop scaling with
    // corpus size (the full corpus is only assigned ONCE, for the lists).
    val trainFrac = math.min(1.0, TRAIN_PER_LIST.toDouble * numLists / math.max(1L, n))
    val train = (if (trainFrac < 1.0)
      p.where(pmod(xxhash64(col("nid")), lit(1000000L)) < lit((trainFrac * 1e6).toLong))
    else p).select(col("pq")).as[Array[Long]]
    for (_ <- 1 to lloydRounds) {
      val bc = spark.sparkContext.broadcast(cents)
      // per-partition partial (count, vector-sum) per list: the shuffle and
      // the driver collect scale with partitions×nlist×dims — never with n
      val partials = train.mapPartitions { it =>
        val cs = bc.value
        val cn2 = cs.map(sqNorm)
        val dims = if (cs.nonEmpty) cs(0).length else 0
        val cnt = new Array[Long](cs.length)
        val sums = Array.ofDim[Long](cs.length, dims)
        it.foreach { v =>
          val j = nearestCentIdx(v, cs, cn2)
          cnt(j) += 1
          var d = 0
          while (d < dims) { sums(j)(d) += v(d); d += 1 }
        }
        Iterator.range(0, cs.length).filter(cnt(_) > 0)
          .map(j => (j, cnt(j), sums(j)))
      }.toDF("list_id", "cnt", "sums")
      val means = partials
        .select(col("list_id"), col("cnt"), posexplode(col("sums")).as(Seq("_d", "_s")))
        .groupBy("list_id", "_d")
        .agg((sum(col("_s")).cast("double") / sum(col("cnt"))).as("_m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = Math.round(r.getDouble(2)))
      cents = next
    }

    cents
  }

  /** Query-side probe table: (qid, qq, qn2, list_id × nprobe). */
  private def ivfProbes(spark: SparkSession, queries: DataFrame, idCol: String,
                        vecCol: String, nprobe: Int,
                        bc: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]): DataFrame =
    withNearestLists(
      queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq")),
      "qq", nprobe, bc)
      .withColumn("qn2", dotQ(col("qq"), col("qq")))

  /** Exact L2 re-rank of probed lists (lists assigned by L2 ⇒ ranking must
    * be L2 too, the FAISS IndexIVFFlat contract): |p−q|² = |p|² − 2p·q +
    * |q|², exact int64 on quantized vectors.
    */
  private def ivfRank(lists: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    lists.join(broadcast(probes), Seq("list_id"))
      .where(col("qid") =!= col("nid"))
      .withColumn("d2", col("pn2") - lit(2L) * dotQ(col("pq"), col("qq")) + col("qn2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("d2"))
  }

  /** Build the IVF index ONCE and persist it as a partition-pruned table:
    * `<dir>/lists` is parquet PARTITIONED BY list_id (one directory per
    * inverted list — a query batch physically reads only its probed
    * lists), `<dir>/centroids` is the ≤nlist coarse-quantizer table. This
    * is the build-once/query-many shape a real ANN deployment runs — the
    * corpus is scanned once at build; each later query batch costs
    * O(probed fraction), not O(corpus). Returns numLists.
    */
  def ivfBuildSave(spark: SparkSession, points: DataFrame, idCol: String,
                   vecCol: String, dir: String, nlist: Int = 0,
                   lloydRounds: Int = 2): Int = {
    import spark.implicits._
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
      .persist()
    // unpersist as soon as the last pass (the list write) completes — the
    // writes below are actions, so everything consuming `p` runs inside the
    // try; long sessions rebuilding indexes must not pin storage memory.
    try {
      val n = p.count()
      val numLists =
        if (nlist > 0) nlist
        else math.max(16, math.sqrt(n.toDouble).toInt)
      val cents = ivfTrain(spark, p, numLists, lloydRounds, nKnown = n)
      val bc = spark.sparkContext.broadcast(cents)
      withNearestLists(p, "pq", 1, bc)
        .withColumn("pn2", dotQ(col("pq"), col("pq")))
        .write.mode("error").partitionBy("list_id").parquet(s"$dir/lists")
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list_id", "cvec")
        .repartition(1).write.mode("error").parquet(s"$dir/centroids")
      numLists
    } finally p.unpersist(blocking = false)
  }

  /** Append new vectors to a persisted IVF index WITHOUT retraining:
    * assign against the existing centroid table and append into the same
    * partitioned list layout (new parquet files inside the probed-by-query
    * list directories — the FAISS `add` verb). Centroids stay fixed, so
    * earlier assignments remain valid; periodic `ivfBuildSave` retrains
    * when drift accumulates (the deployment convention). Returns the
    * number of vectors appended.
    */
  def ivfAppend(spark: SparkSession, dir: String, points: DataFrame,
                idCol: String, vecCol: String): Long = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("list_id").collect().map(_.getSeq[Long](1).toArray)
    val bc = spark.sparkContext.broadcast(cents)
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
    val assigned = withNearestLists(p, "pq", 1, bc)
      .withColumn("pn2", dotQ(col("pq"), col("pq")))
      .localCheckpoint() // count + write from one assignment pass
    assigned.write.mode("append").partitionBy("list_id").parquet(s"$dir/lists")
    assigned.count()
  }

  /** Query a persisted IVF index: probes resolve against the (re-read)
    * centroid table, then ONLY the probed list partitions are scanned —
    * `isin` over the partition column prunes at the file-listing level
    * (spec asserts inputFiles shrink). Same ranking contract as ivfTopK.
    */
  def ivfQueryIndex(spark: SparkSession, dir: String, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nprobe: Int = 4): DataFrame = {
    val centRows = spark.read.parquet(s"$dir/centroids")
      .orderBy("list_id").collect()
    val cents = centRows.map(_.getSeq[Long](1).toArray)
    val bc = spark.sparkContext.broadcast(cents)
    val probes = ivfProbes(spark, queries, idCol, vecCol, nprobe, bc)
      .localCheckpoint() // probe set computed once: reused for pruning + join
    val probed = probes.select("list_id").distinct().collect().map(_.getInt(0))
    val lists = spark.read.parquet(s"$dir/lists")
      .where(col("list_id").isInCollection(probed.toSeq))
    ivfRank(lists, probes, k)
  }

  /** Query a persisted IVF index WITHOUT broadcasting its centroid table —
    * the 10^12-scale shape the flat path documents as its limit: nlist ~ √n
    * is itself millions of rows there, too big for a driver collect or a
    * broadcast. Two-stage probing (the IMI / two-level-IVF idea, public
    * knowledge — Babenko & Lempitsky 2012 inverted multi-index; FAISS
    * IVF-in-IVF quantizers):
    *
    *   1. a √nlist META-quantizer (content-hash seeded over the centroid
    *      table — the only structure that still broadcasts) buckets every
    *      centroid into one coarse cell: the centroid table shuffles once
    *      on its coarse key and NEVER reaches the driver;
    *   2. each query expands its `coarseProbe` nearest coarse cells and
    *      equi-joins candidate centroids on coarse_id (query batch
    *      broadcast, centroid side streamed), keeping its top-`nprobe`
    *      lists with the bounded k-heap aggregate — no sort node, no
    *      all-centroid scan per query;
    *   3. list scan + exact re-rank are unchanged (physically
    *      partition-pruned to the probed lists).
    *
    * With coarseProbe ≥ ncoarse the candidate set is every centroid and
    * the probe set equals the flat [[ivfQueryIndex]] path's exactly
    * (spec-gated); at the operating point the coarse stage is approximate
    * in the standard two-level way (recall bound q71).
    */
  def ivfQueryIndexSharded(spark: SparkSession, dir: String, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           nprobe: Int = 4, coarseProbe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("list_id").as("c_list"), col("cvec").as("cq"))
    val nc = cents.count()
    val ncoarse = math.max(4, math.sqrt(nc.toDouble).toInt)
    val meta = cents.orderBy(xxhash64(col("c_list")), col("c_list"))
      .limit(ncoarse).select("cq").collect().map(_.getSeq[Long](0).toArray)
    val bcMeta = spark.sparkContext.broadcast(meta)
    val centAssigned = withNearestLists(cents, "cq", 1, bcMeta)
      .withColumnRenamed("list_id", "coarse_id")
      .withColumn("cn2", dotQ(col("cq"), col("cq")))
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"))
      .withColumn("qn2", dotQ(col("qq"), col("qq")))
    val qCoarse = withNearestLists(q, "qq", math.min(coarseProbe, ncoarse), bcMeta)
      .withColumnRenamed("list_id", "coarse_id")
    val cand = centAssigned.join(broadcast(qCoarse), Seq("coarse_id"))
      .withColumn("cd2", col("cn2") - lit(2L) * dotQ(col("cq"), col("qq")) + col("qn2"))
    val chosen = cand.groupBy("qid")
      .agg(graft.functions.KnnTopKAgg.knnTopK(
        struct(col("cd2"), col("c_list").cast("long")), nprobe).as("_k"))
      .select(col("qid"), explode(col("_k")).as("kk"))
      .select(col("qid"), col("kk.id").cast("int").as("list_id"))
    val probes = chosen.join(q, Seq("qid")).localCheckpoint()
    val probed = probes.select("list_id").distinct().collect().map(_.getInt(0))
    val lists = spark.read.parquet(s"$dir/lists")
      .where(col("list_id").isInCollection(probed.toSeq))
    ivfRank(lists, probes, k)
  }

  // -------------------------------------------------------------------
  // Product quantization (PQ) — compressed persisted IVF lists.
  //
  // Public knowledge: Jégou et al. 2011, "Product Quantization for Nearest
  // Neighbor Search" (the FAISS IndexIVFPQ layout). The vector is split
  // into m subvectors; each subspace gets its own ksub-centroid codebook;
  // a corpus vector is stored as m one-byte codes (ksub ≤ 256) instead of
  // dims×8-byte quantized longs. Queries evaluate the ASYMMETRIC distance
  // (exact query vs quantized corpus): a per-query lookup table
  // lut[sub·ksub+code] = |q_sub − c_sub,code|² makes each candidate cost m
  // array reads (graft.functions.AdcDistExpr, codegen). ADC ranks are
  // approximate, so the top-C ADC candidates are re-ranked EXACTLY against
  // the full vectors from the primary store — the standard deployment
  // shape (compressed index scans everything probed; exact math touches
  // only C rows per query).
  //
  // Codebooks encode RESIDUALS p − c_list (FAISS by_residual=true, the
  // IVFPQ default) — raw-vector codebooks were measured at 0.72 recall vs
  // the flat index's 1.0 on the clustered spec fixture: same-cluster
  // members collapse onto the same few codes, ADC ties break by id, and
  // the true neighbors fall out of the re-rank window. Residuals are
  // small and cluster-centered, so the same ksub codes resolve WITHIN a
  // cluster; the query side pays one LUT per (query, probed list) instead
  // of per query — still query-batch-sized.
  // -------------------------------------------------------------------

  /** Train the PQ codebook: cents(sub)(code) is a (dims/m)-dim int64
    * sub-centroid. All m subspaces train in ONE distributed job per Lloyd
    * round (partials keyed by (sub, code)); the sample is hash-capped at
    * ~[[TRAIN_PER_LIST]]·ksub vectors, the FAISS convention. Means round
    * to the integer grid so encoding and ADC stay exact-integer.
    */
  def pqTrain(spark: SparkSession, p: DataFrame, m: Int, ksub: Int,
              lloydRounds: Int = 2, nKnown: Long = -1L): Array[Array[Array[Long]]] = {
    import spark.implicits._
    val n = if (nKnown >= 0) nKnown else p.count()
    val ks = math.min(ksub.toLong, n).toInt
    require(ks >= 1 && ks <= 256, s"ksub must be in [1,256], got $ks")
    // deterministic content-hash seeds: ks full vectors, sliced per subspace
    val seedRows = p.orderBy(xxhash64(col("nid")), col("nid")).limit(ks)
      .select(col("pq")).collect().map(_.getSeq[Long](0).toArray)
    val dims = seedRows(0).length
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    var cents: Array[Array[Array[Long]]] =
      Array.tabulate(m, ks)((sub, c) => seedRows(c).slice(sub * dsub, (sub + 1) * dsub))

    val trainFrac = math.min(1.0, TRAIN_PER_LIST.toDouble * ks / math.max(1L, n))
    val train = (if (trainFrac < 1.0)
      p.where(pmod(xxhash64(col("nid")), lit(1000000L)) < lit((trainFrac * 1e6).toLong))
    else p).select(col("pq")).as[Array[Long]]
    for (_ <- 1 to lloydRounds) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = train.mapPartitions { it =>
        val cs = bc.value
        val cnt = Array.ofDim[Long](m, ks)
        val sums = Array.ofDim[Long](m, ks, dsub)
        it.foreach { v =>
          var sub = 0
          while (sub < m) {
            val c = nearestSubCode(v, sub * dsub, cs(sub))
            cnt(sub)(c) += 1
            var d = 0
            while (d < dsub) { sums(sub)(c)(d) += v(sub * dsub + d); d += 1 }
            sub += 1
          }
        }
        for { sub <- Iterator.range(0, m); c <- Iterator.range(0, ks)
              if cnt(sub)(c) > 0 } yield (sub, c, cnt(sub)(c), sums(sub)(c))
      }.toDF("sub", "code", "cnt", "sums")
      val means = partials
        .select(col("sub"), col("code"), col("cnt"), posexplode(col("sums")).as(Seq("_d", "_s")))
        .groupBy("sub", "code", "_d")
        .agg((sum(col("_s")).cast("double") / sum(col("cnt"))).as("_m"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      means.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = Math.round(r.getDouble(3)))
      cents = next
    }
    cents
  }

  /** Nearest sub-centroid index for v[off, off+dsub) — exact int64 L2,
    * strict < so ties go to the lower code. */
  private def nearestSubCode(v: Array[Long], off: Int,
                             subCents: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue; var c = 0
    while (c < subCents.length) {
      val cent = subCents(c)
      var d2 = 0L; var d = 0
      while (d < cent.length) {
        val diff = v(off + d) - cent(d); d2 += diff * diff; d += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Append `<out>: array<long>` = v − c(list_id), the coarse-quantizer
    * residual (needs a `list_id` column) — narrow primitive pass.
    */
  private def withResidual(df: DataFrame, vq: String, out: String,
      bc: Broadcast[Array[Array[Long]]]): DataFrame = {
    val outSchema = df.schema.add(out, ArrayType(LongType, containsNull = false), nullable = false)
    val enc = RowEncoder.encoderFor(outSchema)
    val iVq = df.schema.fieldIndex(vq)
    val iList = df.schema.fieldIndex("list_id")
    df.mapPartitions { it =>
      val cs = bc.value
      it.map { r =>
        val v = r.getSeq[Long](iVq).toArray
        val c = cs(r.getInt(iList))
        val res = new Array[Long](v.length)
        var d = 0
        while (d < v.length) { res(d) = v(d) - c(d); d += 1 }
        Row.fromSeq(r.toSeq :+ res.toSeq)
      }
    }(enc)
  }

  /** Append `codes: binary` (m one-byte PQ codes) — broadcast codebook into
    * a narrow primitive pass, same layout rationale as [[withNearestLists]].
    */
  private def withPqCodes(df: DataFrame, vq: String,
      bc: Broadcast[Array[Array[Array[Long]]]]): DataFrame = {
    val outSchema = df.schema.add("codes", BinaryType, nullable = false)
    val enc = RowEncoder.encoderFor(outSchema)
    val iVq = df.schema.fieldIndex(vq)
    df.mapPartitions { it =>
      val cs = bc.value
      val m = cs.length
      val dsub = cs(0)(0).length
      it.map { r =>
        val v = r.getSeq[Long](iVq).toArray
        val codes = new Array[Byte](m)
        var sub = 0
        while (sub < m) {
          codes(sub) = nearestSubCode(v, sub * dsub, cs(sub)).toByte
          sub += 1
        }
        Row.fromSeq(r.toSeq :+ codes)
      }
    }(enc)
  }

  /** ADC lookup table for one residual query vector: lut[sub·ksub+code] =
    * |v_sub − c_sub,code|², exact int64.
    */
  private def adcLut(v: Array[Long], cs: Array[Array[Array[Long]]],
                     ksub: Int): Array[Long] = {
    val m = cs.length
    val dsub = cs(0)(0).length
    val lut = new Array[Long](m * ksub)
    var sub = 0
    while (sub < m) {
      val subCents = cs(sub)
      var c = 0
      while (c < subCents.length) {
        val cent = subCents(c)
        var d2 = 0L; var d = 0
        while (d < dsub) {
          val diff = v(sub * dsub + d) - cent(d); d2 += diff * diff; d += 1
        }
        lut(sub * ksub + c) = d2
        c += 1
      }
      sub += 1
    }
    lut
  }

  /** Build a PQ-COMPRESSED persisted IVF index: same partition-pruned
    * layout as [[ivfBuildSave]] but each list row is (nid, codes[m bytes])
    * instead of (nid, full vector, norm) — at dims=64 that is 16 B vs
    * 520 B of vector payload per row, so at 10^12-vector scale list
    * storage and probe-scan I/O shrink ~8× (≥4× gated on-disk in
    * SimilaritySpec). `<dir>/pq_centroids` holds the m×ksub codebook.
    * Returns numLists.
    */
  def ivfPqBuildSave(spark: SparkSession, points: DataFrame, idCol: String,
                     vecCol: String, dir: String, nlist: Int = 0,
                     m: Int = 16, ksub: Int = 256,
                     lloydRounds: Int = 2): Int = {
    import spark.implicits._
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
      .persist()
    try {
      val n = p.count()
      val numLists =
        if (nlist > 0) nlist
        else math.max(16, math.sqrt(n.toDouble).toInt)
      val cents = ivfTrain(spark, p, numLists, lloydRounds, nKnown = n)
      val bcCoarse = spark.sparkContext.broadcast(cents)
      // residuals assigned once, shared by codebook training and encoding —
      // localCheckpoint: training is multi-pass over this dim-capped table
      val assigned = withResidual(withNearestLists(p, "pq", 1, bcCoarse),
        "pq", "res", bcCoarse).localCheckpoint()
      val pqCents = pqTrain(spark,
        assigned.select(col("nid"), col("res").as("pq")), m, ksub, lloydRounds,
        nKnown = n)
      val bcPq = spark.sparkContext.broadcast(pqCents)
      withPqCodes(assigned, "res", bcPq)
        .select("nid", "codes", "list_id")
        .write.mode("error").partitionBy("list_id").parquet(s"$dir/lists")
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list_id", "cvec")
        .repartition(1).write.mode("error").parquet(s"$dir/centroids")
      (for { sub <- pqCents.indices; c <- pqCents(sub).indices }
        yield (sub, c, pqCents(sub)(c).toSeq))
        .toDF("sub", "code", "cvec")
        .repartition(1).write.mode("error").parquet(s"$dir/pq_centroids")
      numLists
    } finally p.unpersist(blocking = false)
  }

  /** Query a PQ-compressed persisted index: probed list partitions are
    * pruned exactly as [[ivfQueryIndex]]; candidates rank by codegen ADC
    * (m table lookups per row, no vector math), the top `rerankC` per
    * query re-rank EXACTLY against the full vectors in `points` (the
    * primary store — the index holds no vectors, that is the point). Same
    * output contract as [[ivfQueryIndex]].
    */
  def ivfPqQueryIndex(spark: SparkSession, dir: String, points: DataFrame,
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int, nprobe: Int = 4, rerankC: Int = 100): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("list_id").collect().map(_.getSeq[Long](1).toArray)
    val pqRows = spark.read.parquet(s"$dir/pq_centroids")
      .orderBy("sub", "code").collect()
    val m = pqRows.map(_.getInt(0)).max + 1
    val ksub = pqRows.map(_.getInt(1)).max + 1
    val pqCents = Array.ofDim[Array[Long]](m, ksub)
    pqRows.foreach(r => pqCents(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray)
    val bcCoarse = spark.sparkContext.broadcast(cents)
    val bcPq = spark.sparkContext.broadcast(pqCents)

    // codes are RESIDUAL-encoded (p − c_list), so the ADC identity is
    // |q − (c_list + code)|² = |(q − c_list) − code|²: one LUT per
    // (query, probed list). The LUT (m·ksub longs ≈ 32 KB) must NOT ride
    // the join as a column — a broadcast join copies build-side bytes into
    // EVERY candidate output row, which materialized multi-GB through the
    // top-C shuffle (measured 10× wall on the driver corpus). Instead the
    // join carries only (qid, list_id), the query RESIDUALS ship once per
    // executor as a broadcast map, and each scan partition builds the LUTs
    // it needs lazily, caching per (qid, list_id).
    val q0 = queries.select(col(idCol).cast("long").as("qid"),
      quantize(col(vecCol)).as("qq"))
    val probes = withResidual(withNearestLists(q0, "qq", nprobe, bcCoarse),
        "qq", "qres", bcCoarse)
      .withColumn("qn2", dotQ(col("qq"), col("qq")))
      .localCheckpoint() // probe set computed once: pruning + join + re-rank
    val probed = probes.select("list_id").distinct().collect().map(_.getInt(0))
    val resMap = probes.select("qid", "list_id", "qres").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2).toArray).toMap
    val bcRes = spark.sparkContext.broadcast(resMap)
    val lists = spark.read.parquet(s"$dir/lists")
      .where(col("list_id").isInCollection(probed.toSeq))

    import spark.implicits._
    val adcCand = lists
      .join(broadcast(probes.select("qid", "list_id")), Seq("list_id"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("codes"), col("list_id"))
      .as[(Long, Long, Array[Byte], Int)]
      .mapPartitions { it =>
        val cs = bcPq.value
        val rm = bcRes.value
        val luts = scala.collection.mutable.HashMap.empty[(Long, Int), Array[Long]]
        it.map { case (qid, nid, codes, listId) =>
          val lut = luts.getOrElseUpdate((qid, listId), adcLut(rm((qid, listId)), cs, ksub))
          var adc = 0L; var sub = 0
          while (sub < codes.length) {
            adc += lut(sub * ksub + (codes(sub) & 0xFF)); sub += 1
          }
          (qid, nid, adc)
        }
      }.toDF("qid", "nid", "adc")
    val wAdc = Window.partitionBy("qid").orderBy(col("adc"), col("nid"))
    val cand = adcCand
      .withColumn("crank", row_number().over(wAdc))
      .where(col("crank") <= rerankC)
      .select("qid", "nid")
    // exact re-rank: fetch the C survivors' full vectors from the primary
    // store — candidate side is query-batch-sized, so broadcast it and the
    // big side streams through one hash join; query vectors re-join from
    // the (small) probe table, deduped back to one row per query
    val pFull = points.select(col(idCol).cast("long").as("nid"),
        quantize(col(vecCol)).as("pq"))
      .withColumn("pn2", dotQ(col("pq"), col("pq")))
    val qVec = probes.select("qid", "qq", "qn2").dropDuplicates("qid")
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    pFull.join(broadcast(cand), Seq("nid"))
      .join(broadcast(qVec), Seq("qid"))
      .withColumn("d2", col("pn2") - lit(2L) * dotQ(col("pq"), col("qq")) + col("qn2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("d2"))
  }

  /** k-means training sample size per centroid (FAISS trains IVF coarse
    * quantizers on ≤ max_points_per_centroid·nlist vectors for the same
    * reason: centroid placement needs a sample, not the corpus).
    */
  val TRAIN_PER_LIST = 256

  private def sqNorm(c: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** |c|² − 2 v·c — L2 rank surrogate (|v|² is constant per row). */
  private def relDist(v: Array[Long], c: Array[Long], n2: Long): Long = {
    var dot = 0L; var i = 0
    while (i < v.length) { dot += v(i) * c(i); i += 1 }
    n2 - 2L * dot
  }

  private def nearestCentIdx(v: Array[Long], cs: Array[Array[Long]],
                             cn2: Array[Long]): Int = {
    var best = 0; var bestD = Long.MaxValue; var j = 0
    while (j < cs.length) {
      val d = relDist(v, cs(j), cn2(j))
      if (d < bestD) { bestD = d; best = j } // strict < : ties → lower index
      j += 1
    }
    best
  }

  /** Indices of the n L2-nearest centroids, ascending (distance, index) —
    * insertion into a bounded array (n ≤ nprobe, single digits).
    */
  private def topNCentIdx(v: Array[Long], cs: Array[Array[Long]],
                          cn2: Array[Long], n: Int): Array[Int] = {
    val m = math.min(n, cs.length)
    val bd = Array.fill(m)(Long.MaxValue)
    val bi = new Array[Int](m)
    var j = 0
    while (j < cs.length) {
      val d = relDist(v, cs(j), cn2(j))
      if (d < bd(m - 1)) { // strict: an equal-distance later index never displaces
        var pos = m - 1
        while (pos > 0 && d < bd(pos - 1)) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bd(pos) = d; bi(pos) = j
      }
      j += 1
    }
    bi
  }

  /** Append `list_id` (int — centroid index): the n nearest centroids per
    * row. Centroids travel as ONE broadcast array into a primitive
    * mapPartitions loop rather than as literal-array Columns — the literal
    * form embedded nlist×dims constants in the plan, so every Lloyd pass
    * recompiled a multi-MB janino class (measured 3× wall on q53), and a
    * codegen Expression cannot capture a broadcast. This is the MLlib
    * KMeans layout: centroids ship once per executor, assignment is a
    * shuffle-free narrow pass.
    */
  private def withNearestLists(df: DataFrame, vq: String, n: Int,
      bc: Broadcast[Array[Array[Long]]]): DataFrame = {
    val outSchema = df.schema.add("list_id", IntegerType, nullable = false)
    val enc = RowEncoder.encoderFor(outSchema)
    val iVq = df.schema.fieldIndex(vq)
    df.mapPartitions { it =>
      val cs = bc.value
      val cn2 = cs.map(sqNorm)
      it.flatMap { r =>
        val v = r.getSeq[Long](iVq).toArray
        val base = r.toSeq
        topNCentIdx(v, cs, cn2, n).iterator.map(j => Row.fromSeq(base :+ j))
      }
    }(enc)
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

  /** SemDeDup (Abbas et al. 2023 — public knowledge): coarse-cluster the
    * embedding corpus, then WITHIN each cluster drop every vector that has
    * a lower-id neighbor at cosine ≥ threshold; survivors are the semantic
    * representatives the corpus keeps. One row per input:
    * (vec_id, list_id, kept).
    *
    * Clustering here is the no-refinement coarse quantizer: `numLists`
    * seed vectors picked in content-addressed hash order (charHash64 of
    * the id — deterministic, oracle-reproducible), every vector assigned
    * to its exact-int-L2-nearest seed (ties → lower seed index, the same
    * rule as the IVF kernel). A production deployment clusters through the
    * TRAINED ivf centroid table (ivfBuildSave) instead — the prune
    * semantics are identical; the hash-seed rule is what makes the q6q
    * DuckDB twin bit-exact.
    *
    * Scale: assignment is the shuffle-free broadcast kernel the IVF index
    * uses; the prune is an equi-join on list_id (never all-pairs) —
    * Σ|cluster|² work, the published algorithm's cost model: size
    * `numLists` ∝ n/targetClusterSize (the paper's k ≈ √n convention) so
    * each cluster's block stays executor-sized.
    */
  def semanticDedup(points: DataFrame, idCol: String, vecCol: String,
                    numLists: Int, threshold: Double): DataFrame = {
    val spark = points.sparkSession
    val p = points.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("q"))
    val seeds = p
      .orderBy(graft.functions.TextFunctions.charHash64(
        col("vec_id").cast("string")), col("vec_id"))
      .limit(numLists).select("q").collect().map(_.getSeq[Long](0).toArray)
    val bc = spark.sparkContext.broadcast(seeds)
    val asg = withNearestLists(p, "q", 1, bc)
      .withColumn("n2", dotQ(col("q"), col("q")))
      .localCheckpoint(eager = true) // assignment feeds both join sides once
    val a = asg.select(col("list_id"), col("vec_id").as("id_a"),
      col("q").as("qa"), col("n2").as("na"))
    val b = asg.select(col("list_id"), col("vec_id").as("id_b"),
      col("q").as("qb"), col("n2").as("nb"))
    val dropped = verifyCosine(
        a.join(b, Seq("list_id")).where(col("id_a") < col("id_b")), threshold)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("_drop", lit(true))
    asg.select(col("vec_id"), col("list_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        col("_drop").isNull.as("kept"))
  }

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

  /** Cross-modal alignment filter (the CLIP-score curation gate, LAION
    * shape): every row carries TWO embeddings of the same item — image-side
    * and caption-side, produced by the bi-encoder at ingest — and survives
    * iff their cosine clears `threshold`. Same numeric contract as every
    * ranking metric here: both vectors quantized to int64, exact integer
    * dot and norms, the threshold test `dot > 0 && dot² ≥ t²·na·nb` in
    * double (the verifyCosine rule), so the DuckDB twin reproduces the
    * keep set bit-exactly.
    *
    * Scale: map-only — no shuffle, no state; at 10^12 pairs this pipelines
    * with decode/dedup in one pass over the ingest batch. Rows where either
    * side is a zero vector score dot ≤ 0 and are dropped (aligned=false),
    * matching the convention that degenerate embeddings never pass a
    * similarity gate.
    */
  def alignmentFilter(pairs: DataFrame, idCol: Column, vecACol: Column,
                      vecBCol: Column, threshold: Double): DataFrame = {
    val qa = quantize(vecACol)
    val qb = quantize(vecBCol)
    pairs.select(idCol.cast("long").as("pair_id"),
        dotQ(qa, qb).as("dot"),
        dotQ(qa, qa).as("na"),
        dotQ(qb, qb).as("nb"))
      .withColumn("aligned",
        col("dot") > 0 &&
          col("dot").cast("double") * col("dot").cast("double") >=
            lit(threshold * threshold) * col("na").cast("double") * col("nb").cast("double"))
  }

  /** Sharded HNSW graph ANN (graft.core.Hnsw; Malkov & Yashunin 2016) — the
    * high-recall serving index the IVF family doesn't cover: per-query cost
    * is O(ef·M·log shard) distance evals instead of IVF's O(probed-list
    * rows), the win when single-query latency at recall ≥0.95 matters.
    *
    * Deployment shape (the Lucene/Elastic per-segment layout): the corpus
    * hash-partitions into `shards`, ONE graph builds per shard inside
    * mapPartitions (memory bounded by shard rows, the graph never crosses
    * the wire or touches the driver), every query searches all shards and
    * per-shard top-k merge through one k-sized aggregate. At 10^12 rows
    * shards scale out horizontally; per-shard build/search cost is constant
    * in corpus size. The query batch is the broadcast side (same contract
    * as [[topKDot]]).
    *
    * Determinism: shard = pmod(hash) of nid via Spark's own hash
    * partitioning, insertion order = ascending nid within shard, node
    * levels from a splitmix of the GLOBAL id — the graph is a pure function
    * of the id set. Ranking metric is exact int64 squared-L2 on quantized
    * vectors, identical to [[topKL2]] (the exact twin the recall gates
    * compare against). Approximate: recall gated in SimilaritySpec + the
    * q7a driver bound row.
    */
  def hnswTopK(spark: SparkSession, points: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int, shards: Int = 8,
               m: Int = 16, efConstruction: Int = 100, efSearch: Int = 64): DataFrame = {
    import spark.implicits._
    val bcQ = broadcastQueries(spark, queries, idCol, vecCol)
    val p = shardedPoints(points, idCol, vecCol, shards)
    val perShard = p.mapPartitions { it =>
      shardGraphs(it, m, efConstruction).flatMap { case (_, g) =>
        searchGraph(g, bcQ.value, k, efSearch)
      }
    }.toDF("qid", "nid", "d2")
    hnswMerge(perShard, k)
  }

  /** (qid, quantized vec) query batch, sorted, broadcast — the small side
    * by construction (same contract as [[topKDot]]'s broadcast).
    */
  private def broadcastQueries(spark: SparkSession, queries: DataFrame,
                               idCol: String, vecCol: String): Broadcast[Array[(Long, Array[Long])]] = {
    val qArr = queries.select(col(idCol).cast("long").as("qid"), quantize(col(vecCol)).as("qq"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    spark.sparkContext.broadcast(qArr)
  }

  /** Corpus with its shard id (Spark's own HashPartitioning formula —
    * `pmod(murmur3(nid), shards)` — so [[hnswAppend]] routes new rows to
    * the same shard), co-located one shard per partition.
    */
  private def shardedPoints(points: DataFrame, idCol: String, vecCol: String,
                            shards: Int) = {
    import points.sparkSession.implicits._
    points.select(col(idCol).cast("long").as("nid"), quantize(col(vecCol)).as("pq"))
      .withColumn("shard_id", pmod(hash(col("nid")), lit(shards)))
      .repartition(shards, col("shard_id"))
      .as[(Long, Seq[Long], Int)]
  }

  /** Build one graph per shard present in this partition (rows inserted in
    * ascending nid — the determinism contract).
    */
  private def shardGraphs(it: Iterator[(Long, Seq[Long], Int)], m: Int,
                          efConstruction: Int): Iterator[(Int, graft.core.Hnsw)] = {
    val byShard = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]]()
    it.foreach { case (nid, v, s) =>
      byShard.getOrElseUpdate(s, scala.collection.mutable.ArrayBuffer.empty) += ((nid, v.toArray))
    }
    byShard.iterator.map { case (s, rows) =>
      val sorted = rows.sortBy(_._1)
      val g = new graft.core.Hnsw(sorted.head._2.length, m, efConstruction)
      sorted.foreach { case (nid, v) => g.insert(nid, v) }
      (s, g)
    }
  }

  private def searchGraph(g: graft.core.Hnsw, qs: Array[(Long, Array[Long])],
                          k: Int, efSearch: Int): Iterator[(Long, Long, Long)] =
    qs.iterator.flatMap { case (qid, qv) =>
      // k+1 then drop self: the graph contains the query row itself when
      // queries ⊆ corpus (the benchmark convention)
      g.search(qv, k + 1, math.max(efSearch, k + 1)).iterator
        .filter(_._1 != qid).take(k)
        .map { case (nid, d2) => (qid, nid, d2) }
    }

  /** Global merge: ≤ shards·k candidate rows per query — the same
    * window-on-small-candidate-set shape as ivfRank.
    */
  private def hnswMerge(perShard: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    perShard.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("d2"))
  }

  /** Build the sharded HNSW index ONCE and persist it: each shard's graph
    * serializes (vectors + adjacency, deflate) into ≤`chunkBytes` chunk
    * rows under `<dir>/graphs`, parquet PARTITIONED BY shard_id — the
    * build-once/query-many serving shape ([[ivfBuildSave]]'s contract for
    * the graph family), and the partition layout is what lets
    * [[hnswAppend]] rewrite ONLY the shards that receive new vectors.
    * Returns the shard count.
    */
  def hnswBuildSave(spark: SparkSession, points: DataFrame, idCol: String,
                    vecCol: String, dir: String, shards: Int = 8,
                    m: Int = 16, efConstruction: Int = 100,
                    chunkBytes: Int = 8 << 20): Int = {
    import spark.implicits._
    shardedPoints(points, idCol, vecCol, shards)
      .mapPartitions { it =>
        shardGraphs(it, m, efConstruction).flatMap { case (s, g) =>
          chunk(g.serialize(), chunkBytes).zipWithIndex.map { case (b, i) =>
            (s, i, b)
          }
        }
      }
      .toDF("shard_id", "chunk_no", "bytes")
      .write.mode("overwrite").partitionBy("shard_id").parquet(s"$dir/graphs")
    shards
  }

  private def chunk(bytes: Array[Byte], chunkBytes: Int): Iterator[Array[Byte]] =
    if (bytes.length <= chunkBytes) Iterator(bytes)
    else (0 until bytes.length by chunkBytes).iterator.map { off =>
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + chunkBytes, bytes.length))
    }

  /** Query a persisted HNSW index: shard chunk rows co-locate and reassemble
    * per shard, each graph deserializes ONCE per batch and serves every
    * query (graph bytes never shuffle beyond their own reassembly; the
    * query batch is the broadcast side). A deserialized graph is
    * bit-identical to the built one, so persisted results == in-job
    * [[hnswTopK]] rows (spec-gated).
    */
  def hnswQueryIndex(spark: SparkSession, dir: String, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     efSearch: Int = 64): DataFrame = {
    import spark.implicits._
    val bcQ = broadcastQueries(spark, queries, idCol, vecCol)
    val graphs = spark.read.parquet(s"$dir/graphs")
      .select(col("shard_id").cast("int"), col("chunk_no").cast("int"), col("bytes"))
      .as[(Int, Int, Array[Byte])]
    val shards = graphs.select(col("shard_id")).distinct().count().toInt
    val perShard = graphs
      .repartition(shards, col("shard_id"))
      .sortWithinPartitions("shard_id", "chunk_no")
      .mapPartitions { it =>
        reassemble(it).flatMap { case (_, bytes) =>
          searchGraph(graft.core.Hnsw.deserialize(bytes), bcQ.value, k, efSearch)
        }
      }.toDF("qid", "nid", "d2")
    hnswMerge(perShard, k)
  }

  /** Incremental add to a persisted HNSW index (the FAISS `add` verb for
    * the graph family): new vectors route to their shard by the SAME
    * hash formula the build used, each touched shard's graph deserializes,
    * inserts the new rows (ascending nid), re-serializes — and dynamic
    * partition overwrite rewrites ONLY the touched shard directories;
    * untouched shards are never read or written. Returns rows appended.
    */
  def hnswAppend(spark: SparkSession, dir: String, points: DataFrame,
                 idCol: String, vecCol: String,
                 chunkBytes: Int = 8 << 20): Long = {
    import spark.implicits._
    val shards = spark.read.parquet(s"$dir/graphs")
      .select(col("shard_id")).distinct().count().toInt
    val news = shardedPoints(points, idCol, vecCol, shards)
    val touched = news.select(col("shard_id")).distinct()
    val existing = spark.read.parquet(s"$dir/graphs")
      .join(broadcast(touched), Seq("shard_id"), "left_semi")
      .select(col("shard_id").cast("int"), col("chunk_no").cast("int"), col("bytes"))
      .as[(Int, Int, Array[Byte])]
      .map { case (s, c, b) => (s, c, b, true) } // true = graph chunk
    val newRows = news.map { case (nid, v, s) =>
      // ride the same union: encode a new vector as a pseudo-chunk with
      // chunk_no = -1 - position marker; bytes = 8B nid + dim*8B vec
      val bb = java.nio.ByteBuffer.allocate(8 + v.length * 8)
      bb.putLong(nid); v.foreach(bb.putLong)
      (s, Int.MinValue, bb.array(), false)
    }
    val appended = points.count()
    existing.union(newRows)
      .repartition(col("_1"))
      .sortWithinPartitions("_1", "_2")
      .mapPartitions { it =>
        // per shard: new-vector rows (chunk_no = MinValue) sort first,
        // then the graph chunks in order
        val byShard = it.toSeq.groupBy(_._1)
        byShard.iterator.flatMap { case (s, rows) =>
          val (pseudo, chunks) = rows.partition(!_._4)
          val decoded = pseudo.map { r =>
            val bb = java.nio.ByteBuffer.wrap(r._3)
            val nid = bb.getLong
            val v = new Array[Long]((r._3.length - 8) / 8)
            var i = 0
            while (i < v.length) { v(i) = bb.getLong; i += 1 }
            (nid, v)
          }.sortBy(_._1)
          // a shard that was EMPTY at build time has no chunk rows — new
          // vectors seed a fresh graph there
          val g =
            if (chunks.nonEmpty) graft.core.Hnsw.deserialize(concatBytes(chunks.sortBy(_._2).map(_._3)))
            else new graft.core.Hnsw(decoded.head._2.length)
          decoded.foreach { case (nid, v) => g.insert(nid, v) }
          chunk(g.serialize(), chunkBytes).zipWithIndex.map { case (b, i) => (s, i, b) }
        }
      }
      .toDF("shard_id", "chunk_no", "bytes")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard_id").parquet(s"$dir/graphs")
    appended
  }

  private def concatBytes(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  /** Per-shard chunk reassembly over a (shard_id, chunk_no, bytes) iterator
    * SORTED by (shard_id, chunk_no).
    */
  private def reassemble(it: Iterator[(Int, Int, Array[Byte])]): Iterator[(Int, Array[Byte])] =
    new Iterator[(Int, Array[Byte])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (Int, Array[Byte]) = {
        val s = buf.head._1
        val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        while (buf.hasNext && buf.head._1 == s) parts += buf.next()._3
        (s, concatBytes(parts.toSeq))
      }
    }
}
