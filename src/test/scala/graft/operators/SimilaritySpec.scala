package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity search: brute-force exactness + ANN recall on clustered data. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  val dims = 16

  /** 20 tight clusters of 25 vectors each (unit-ish, deterministic). */
  private val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(20)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    (0L until 500L).map { i =>
      val c = centers((i % 20).toInt)
      i -> c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    }
  }

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)

  private def brute(qid: Long, k: Int): Seq[Long] = {
    val q = quant(vecs.find(_._1 == qid).get._2)
    vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, quant(v).zip(q).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, d) => (-d, id) }.take(k).map(_._1)
  }

  private val df = vecs.toDF("vec_id", "embedding")
  private val queries = df.where(col("vec_id") % 100 === 0) // 5 queries

  test("brute-force topK matches in-JVM oracle exactly") {
    val got = Similarity.topKDot(df, queries, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0))
    for (qid <- Seq(0L, 100L, 200L, 300L, 400L)) {
      val exp = brute(qid, 5)
      val act = got(qid).sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
      assert(act === exp, s"query $qid")
    }
  }

  test("ANN hyperplane LSH reaches high recall on clustered vectors") {
    val got = Similarity.annTopK(spark, df, queries, "vec_id", "embedding",
        k = 5, dims = dims, planes = 6, tables = 8)
      .collect().groupBy(_.getLong(0))
    val recalls = Seq(0L, 100L, 200L, 300L, 400L).map { qid =>
      val exp = brute(qid, 5).toSet
      val act = got.get(qid).map(_.map(_.getLong(1)).toSet).getOrElse(Set.empty)
      (exp intersect act).size.toDouble / exp.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall $mean, per-query $recalls")
  }

  private def bruteL2(qid: Long, k: Int): Seq[Long] = {
    val q = quant(vecs.find(_._1 == qid).get._2)
    vecs.filter(_._1 != qid)
      .map { case (id, v) =>
        (id, quant(v).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1)
  }

  test("IVF ANN reaches high recall on clustered vectors (L2 metric)") {
    val got = Similarity.ivfTopK(spark, df, queries, "vec_id", "embedding",
        k = 5, nlist = 25, nprobe = 6)
      .collect().groupBy(_.getLong(0))
    val recalls = Seq(0L, 100L, 200L, 300L, 400L).map { qid =>
      val exp = bruteL2(qid, 5).toSet
      val act = got.get(qid).map(_.map(_.getLong(1)).toSet).getOrElse(Set.empty)
      (exp intersect act).size.toDouble / exp.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall $mean, per-query $recalls")
  }

  test("filtered IVF (IDSelector): exhaustive probe == brute filtered top-k; filter is exact") {
    val pred = col("vec_id") % 3 === 1
    // nlist=10, nprobe=10 = every list probed -> result must EQUAL the
    // exact top-k over the filtered corpus (candidate coverage is total)
    val ann = Similarity.ivfTopK(spark, df, queries, "vec_id", "embedding",
      k = 5, nlist = 10, nprobe = 10, lloydRounds = 2, keep = pred)
    val rows = ann.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, nid, _) => nid % 3 == 1 }, "filter must be exact")
    val exact = Similarity.topKL2(df.where(pred), queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.toSet === exact, "exhaustive filtered probe must equal filtered brute force")
    // keep = lit(true) degenerates to the unfiltered path
    val unf = Similarity.ivfTopK(spark, df, queries, "vec_id", "embedding",
      k = 5, nlist = 10, nprobe = 10, lloydRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactAll = Similarity.topKL2(df, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unf === exactAll)
  }

  test("persisted IVF index: query equals the one-shot path; probed-list partition pruning is real") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    val numLists = Similarity.ivfBuildSave(spark, df, "vec_id", "embedding", dir,
      nlist = 25, lloydRounds = 2)
    assert(numLists === 25)
    val viaIndex = Similarity.ivfQueryIndex(spark, dir, queries, "vec_id", "embedding",
        k = 5, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // same centroid pipeline is deterministic -> identical rows
    val oneShot = Similarity.ivfTopK(spark, df, queries, "vec_id", "embedding",
        k = 5, nlist = 25, nprobe = 6, lloydRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex === oneShot)
    // pruning: single query, nprobe=2 -> 2 of 25 list partitions. The
    // operator's plan must push the probed set as a PartitionFilter, and a
    // scan with that filter must physically read fewer files (numFiles
    // metric — inputFiles ignores filters, so it can't prove this).
    val one = queries.where(col("vec_id") === 0L)
    val probedRead = Similarity.ivfQueryIndex(spark, dir, one, "vec_id", "embedding",
      k = 5, nprobe = 2)
    assert(probedRead.collect().length === 5)
    val planStr = probedRead.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("list_id"),
      planStr.take(800))
    val pruned = spark.read.parquet(s"$dir/lists")
      .where(col("list_id").isInCollection(Seq(0, 1)))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val allFiles = spark.read.parquet(s"$dir/lists").inputFiles.length
    assert(scan.metrics("numFiles").value < allFiles,
      s"partition filter must shrink the file set: ${scan.metrics("numFiles").value} of $allFiles")
    // incremental add: append clones of vectors 0..4 under new ids — each
    // appended vector lands in its source's list (same nearest centroid),
    // so a k=5 query that ranked the source must now rank the clone at d2=0
    val clones = vecs.take(5).map { case (i, v) => (10000L + i) -> v }
      .toDF("vec_id", "embedding")
    assert(Similarity.ivfAppend(spark, dir, clones, "vec_id", "embedding") === 5L)
    val after = Similarity.ivfQueryIndex(spark, dir,
        df.where(col("vec_id") === 0L), "vec_id", "embedding", k = 1, nprobe = 1)
      .collect()
    assert(after.length === 1)
    assert(after.head.getLong(1) === 10000L, s"clone must be the 0-distance top hit: ${after.toSeq}")
    // degenerate: empty query batch -> empty result, no crash
    assert(Similarity.ivfQueryIndex(spark, dir, queries.limit(0),
      "vec_id", "embedding", k = 5, nprobe = 2).collect().isEmpty)
  }

  test("sharded-centroid two-stage query: exhaustive coarse probe == flat path; operating point keeps recall") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_shard").toString
    Similarity.ivfBuildSave(spark, df, "vec_id", "embedding", dir,
      nlist = 25, lloydRounds = 2)
    // ncoarse = max(4, floor(sqrt(25))) = 5; coarseProbe >= 5 covers every
    // coarse cell -> candidate set is ALL centroids -> probe set and rows
    // must equal the flat (broadcast-centroid) path exactly
    val flat = Similarity.ivfQueryIndex(spark, dir, queries, "vec_id", "embedding",
        k = 5, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exhaustive = Similarity.ivfQueryIndexSharded(spark, dir, queries,
        "vec_id", "embedding", k = 5, nprobe = 6, coarseProbe = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exhaustive === flat, "exhaustive coarse probe must reproduce the flat path")
    // operating point: coarseProbe = 3 of 5 coarse cells — approximate,
    // but on the clustered fixture recall vs exact L2 stays >= 0.8
    val sharded = Similarity.ivfQueryIndexSharded(spark, dir, queries,
        "vec_id", "embedding", k = 5, nprobe = 6, coarseProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.topKL2(df, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(sharded.contains).toDouble / exact.size
    assert(recall >= 0.8, s"two-stage recall $recall < 0.8")
    // empty query batch -> empty result, no crash
    assert(Similarity.ivfQueryIndexSharded(spark, dir, queries.limit(0),
      "vec_id", "embedding", k = 5, nprobe = 6, coarseProbe = 3).collect().isEmpty)
  }

  test("PQ-compressed persisted IVF: recall matches the flat index at >=4x smaller lists; re-rank is exact") {
    import java.nio.file.{Files, Paths}
    // a 64-dim corpus (the driver embeddings shape): 4000 vectors in 40
    // clusters — big enough that parquet footer overhead can't mask the
    // payload shrink, clustered enough that IVF recall is meaningful
    val d64 = 64
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(40)(Array.fill(d64)(rnd.nextGaussian().toFloat))
    val corpus = (0L until 4000L).map { i =>
      val c = centers((i % 40).toInt)
      i -> c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    }
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = cdf.where(col("vec_id") % 200 === 0) // 20 queries
    def bruteL2Of(qid: Long, k: Int): Seq[(Long, Long)] = {
      val q = quant(corpus.find(_._1 == qid).get._2)
      corpus.filter(_._1 != qid)
        .map { case (id, v) =>
          val p = quant(v)
          (id, p.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (id, d2) => (d2, id) }.take(k)
    }

    val dirFlat = Files.createTempDirectory("ivf_flat").toString
    val dirPq = Files.createTempDirectory("ivf_pq").toString
    Similarity.ivfBuildSave(spark, cdf, "vec_id", "embedding", dirFlat,
      nlist = 25, lloydRounds = 2)
    Similarity.ivfPqBuildSave(spark, cdf, "vec_id", "embedding", dirPq,
      nlist = 25, m = 8, ksub = 256, lloydRounds = 2)

    // the compression claim itself: ON-DISK list bytes shrink >= 4x
    def listBytes(dir: String): Long = {
      val s = Files.walk(Paths.get(dir, "lists"))
      try s.filter(p => p.toString.endsWith(".parquet")).mapToLong(Files.size).sum
      finally s.close()
    }
    val (bFlat, bPq) = (listBytes(dirFlat), listBytes(dirPq))
    assert(bPq * 4 <= bFlat, s"PQ lists $bPq B vs flat $bFlat B — shrink < 4x")

    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = rows.groupBy(_.getLong(0))
      val rs = corpus.map(_._1).filter(_ % 200 == 0).map { qid =>
        val exp = bruteL2Of(qid, 5).map(_._1).toSet
        val act = byQ.get(qid).map(_.map(_.getLong(1)).toSet).getOrElse(Set.empty)
        (exp intersect act).size.toDouble / exp.size
      }
      rs.sum / rs.size
    }
    val flatRows = Similarity.ivfQueryIndex(spark, dirFlat, qdf,
      "vec_id", "embedding", k = 5, nprobe = 10).collect()
    // rerankC must cover the ADC ambiguity set: 64-bit codes can't resolve
    // WITHIN a tight cluster (quantization distortion ~ the intra-cluster
    // distance spread — measured recall 0.72 at rerankC=50 < cluster size
    // 100, raw AND residual codebooks alike), so the re-rank window is
    // sized ~2x the expected same-cluster candidate count — the FAISS
    // refine k_factor convention. Still 8x fewer exact distances than the
    // ~1600 probed candidates per query.
    val pqRows = Similarity.ivfPqQueryIndex(spark, dirPq, cdf, qdf,
      "vec_id", "embedding", k = 5, nprobe = 10, rerankC = 200).collect()
    val (rFlat, rPq) = (recallOf(flatRows), recallOf(pqRows))
    // "equal recall bound": exact re-rank of top-C means compression costs
    // (almost) nothing — the probing loss dominates both paths equally
    assert(rPq >= rFlat - 0.05, s"PQ recall $rPq vs flat $rFlat")
    assert(rPq >= 0.8, s"PQ recall $rPq < 0.8 (flat $rFlat)")

    // the re-rank is EXACT: every returned d2 equals the brute-force
    // quantized L2 for that (qid, nid) pair
    pqRows.foreach { r =>
      val q = quant(corpus.find(_._1 == r.getLong(0)).get._2)
      val p = quant(corpus.find(_._1 == r.getLong(1)).get._2)
      val d2 = p.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(r.getLong(3) === d2, s"row $r: d2 must be exact, want $d2")
    }

    // degenerate: empty query batch -> empty result, no crash
    assert(Similarity.ivfPqQueryIndex(spark, dirPq, cdf, qdf.limit(0),
      "vec_id", "embedding", k = 5, nprobe = 2).collect().isEmpty)
  }

  test("Lloyd centroids beat the hash-sample baseline at equal nprobe") {
    // measured on the DRIVER's embeddings corpus (where the q53 bound runs)
    // rather than the synthetic 20-cluster fixture: there the hash-sampled
    // seeds already sit inside every tight cluster, so Lloyd has nothing to
    // fix; on the real mixed corpus k-means pulls centroids toward density
    // and equal-nprobe recall rises (round-2 verdict #3)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.where(col("vec_id") % 100 === 0)
    val exact = Similarity.topKL2(emb, q, "vec_id", "embedding", 10)
      .select("qid", "nid").cache()
    val nExact = exact.count()
    def meanRecall(lloyd: Int): Double = {
      val ann = Similarity.ivfTopK(spark, emb, q, "vec_id", "embedding",
        k = 10, nprobe = 8, lloydRounds = lloyd).select("qid", "nid")
      exact.join(ann, Seq("qid", "nid"), "left_semi").count().toDouble / nExact
    }
    val base = meanRecall(0)
    val refined = meanRecall(2)
    assert(refined > base, s"lloyd=$refined must beat hash-sample=$base")
  }

  test("cosine near-dup pairs: same-cluster pairs found, cross-cluster excluded") {
    val small = vecs.take(50).toDF("vec_id", "embedding") // clusters 0..19, 2-3 members
    val got = Similarity.cosineNearDupPairs(small, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // every reported pair is same-cluster (cluster = id % 20)
    assert(got.forall { case (a, b) => a % 20 == b % 20 })
    // and every same-cluster pair among the 50 is reported (tight clusters)
    val expect = (for {
      a <- 0L until 50L; b <- (a + 1) until 50L if a % 20 == b % 20
    } yield (a, b)).toSet
    assert(got === expect)
  }

  test("exact blocked near-dup pairs == brute force; no join node at all") {
    val brute = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val blocked = Similarity.cosineNearDupPairsExact(df, "vec_id", "embedding", 0.95)
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute, s"blocked=${got.size} brute=${brute.size}")
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1500)) // narrow map over broadcast corpus
    // corpus above the broadcast cap is rejected with guidance, not OOM
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsExact(df, "vec_id", "embedding", 0.95,
        maxBroadcastVectors = 10L)
    }
    assert(e.getMessage.contains("cosineNearDupPairsLsh"))
  }

  test("LSH near-dup pairs: full recall vs brute force, and no cartesian in plan") {
    val brute = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding", 0.95,
      dims = dims, planes = 2, tables = 24)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact verify ⇒ no false positives possible; full candidate recall on
    // this corpus ⇒ identical result sets
    assert(got === brute, s"lsh=${got.size} brute=${brute.size}")
    assert(got.size > 100) // clusters of 25 ⇒ plenty of qualifying pairs
    // the scale invariant: every join is an equi-join — no O(n²) operator
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("LSH candidate maxBucket cap drops oversize buckets (recall trade)") {
    // with a 1-plane code on clustered data, buckets are huge; a tiny cap
    // must strictly reduce candidates but never produce false positives
    val capped = Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding", 0.95,
        dims = dims, planes = 1, tables = 2, maxBucket = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(brute))
  }

  test("semanticDedup == in-JVM reference on planted clusters; prune stays within-cluster") {
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.05f)
    val ca = Array(1f, 0f, 0f, 0f); val cb = Array(0f, 1f, 0f, 0f)
    val rows: Seq[(Long, Array[Float])] =
      (0L until 10L).map(i => i -> jitter(ca)) ++
      (10L until 20L).map(i => i -> jitter(cb)) ++
      Seq(20L -> Array(0.8f, 0.75f, 0f, 0f)) // cross-cluster bridge vector
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
        numLists = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1).toSeq
    // in-JVM reference replicating the full contract: hash-ordered seeds,
    // int-L2 nearest-seed assignment (ties -> lower index), within-cluster
    // cosine prune against any lower-id neighbor
    val q = rows.map { case (i, v) =>
      i -> v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    }.toMap
    def dot(u: Array[Long], v: Array[Long]): Long =
      u.zip(v).map { case (x, y) => x * y }.sum
    val ids = rows.map(_._1)
    val seeds = ids.sortBy(i => (graft.core.TextHash.charHash64(i.toString), i))
      .take(2).map(q)
    def assign(v: Array[Long]): Int =
      seeds.map(c => dot(c, c) - 2 * dot(v, c)).zipWithIndex
        .minBy { case (d, j) => (d, j) }._2
    val asg = ids.map(i => i -> assign(q(i))).toMap
    val t2 = 0.8 * 0.8
    val dropped = ids.filter(bId => ids.exists(aId =>
      aId < bId && asg(aId) == asg(bId) && {
        val d = dot(q(aId), q(bId))
        d > 0 && d.toDouble * d.toDouble >=
          t2 * dot(q(aId), q(aId)).toDouble * dot(q(bId), q(bId)).toDouble
      })).toSet
    val want = ids.sorted.map(i => (i, asg(i), !dropped.contains(i)))
    assert(got === want)
    assert(dropped.nonEmpty, "tight clusters must prune")
    assert(ids.count(i => !dropped.contains(i)) >= 3) // representatives survive
  }

  test("alignmentFilter: identical / orthogonal / opposite / zero / threshold edge") {
    val rows = Seq(
      (1L, Array(1.0f, 0f, 0f), Array(1.0f, 0f, 0f)),   // cos 1 → aligned
      (2L, Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f)),   // cos 0 → not (dot !> 0)
      (3L, Array(1.0f, 0f, 0f), Array(-1.0f, 0f, 0f)),  // cos −1 → not
      (4L, Array(1.0f, 0f, 0f), Array(0f, 0f, 0f)),     // zero side → not
      (5L, Array(1.0f, 0f, 0f), Array(1.0f, 1.0f, 0f)), // cos ≈ .707 ≥ .7
      (6L, Array(1.0f, 1.0f, 0f), Array(-1.0f, 1.0f, 1f))) // cos ≈ 0 → not
    val df = rows.toDF("pair_id", "a", "b")
    val got = Similarity.alignmentFilter(df, col("pair_id"), col("a"), col("b"), 0.7)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> true, 6L -> false))
    // exact integer twin: dot/norms reproduce the quantized reference
    val vals = Similarity.alignmentFilter(df, col("pair_id"), col("a"), col("b"), 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def qz(v: Array[Float]) = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    rows.foreach { case (i, a, b) =>
      val (qa, qb) = (qz(a), qz(b))
      def d(u: Array[Long], v: Array[Long]) = u.zip(v).map { case (x, y) => x * y }.sum
      assert(vals(i) === ((d(qa, qb), d(qa, qa), d(qb, qb))))
    }
  }

  test("Hnsw graph: single shard + exhaustive ef == exact L2 top-k") {
    // one graph with ef = n degenerates to exact search — a hard parity
    // gate on the graph mechanics (no recall slack to hide bugs behind)
    val g = new graft.core.Hnsw(dims, m = 8, efConstruction = 64)
    vecs.sortBy(_._1).foreach { case (id, v) => g.insert(id, quant(v)) }
    assert(g.size === vecs.length)
    for (qid <- Seq(0L, 100L, 200L, 300L, 400L)) {
      val q = quant(vecs.find(_._1 == qid).get._2)
      val got = g.search(q, 6, ef = vecs.length).filter(_._1 != qid).take(5).map(_._1)
      assert(got.toSeq === bruteL2(qid, 5), s"query $qid")
    }
  }

  test("sharded HNSW: recall >= 0.9 at the operating point, deterministic") {
    val got = Similarity.hnswTopK(spark, df, queries, "vec_id", "embedding",
        k = 5, shards = 4, m = 8, efConstruction = 64, efSearch = 32)
      .collect().groupBy(_.getLong(0))
    val recalls = Seq(0L, 100L, 200L, 300L, 400L).map { qid =>
      val exp = bruteL2(qid, 5).toSet
      val act = got.get(qid).map(_.map(_.getLong(1)).toSet).getOrElse(Set.empty)
      (exp intersect act).size.toDouble / exp.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean, per-query $recalls")
    // d2 column is the exact int64 squared-L2 — spot-check against the twin
    val d2s = got(0L).map(r => r.getLong(1) -> r.getLong(3)).toMap
    val q0 = quant(vecs.find(_._1 == 0L).get._2)
    d2s.foreach { case (nid, d2) =>
      val v = quant(vecs.find(_._1 == nid).get._2)
      assert(d2 === v.zip(q0).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    // deterministic: a second run returns the identical row set
    val again = Similarity.hnswTopK(spark, df, queries, "vec_id", "embedding",
        k = 5, shards = 4, m = 8, efConstruction = 64, efSearch = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = got.values.flatten.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === first)
  }

  test("persisted HNSW: query == in-job rows; append rewrites only touched shards") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_hnsw").toString
    // tiny chunk size forces multi-chunk serialization through reassembly
    Similarity.hnswBuildSave(spark, df, "vec_id", "embedding", dir,
      shards = 4, m = 8, efConstruction = 64, chunkBytes = 4096)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val persisted = rows(Similarity.hnswQueryIndex(spark, dir, queries,
      "vec_id", "embedding", k = 5, efSearch = 32))
    val inJob = rows(Similarity.hnswTopK(spark, df, queries, "vec_id", "embedding",
      k = 5, shards = 4, m = 8, efConstruction = 64, efSearch = 32))
    assert(persisted === inJob, "deserialized graphs must answer identically")
    // chunking was real
    val chunksPerShard = spark.read.parquet(s"$dir/graphs")
      .groupBy("shard_id").count().collect().map(_.getLong(1))
    assert(chunksPerShard.forall(_ > 1), "expected multi-chunk graphs at 4KB chunks")
    // append: one new vector per cluster-0 center; only ITS shard rewrites
    val before = spark.read.parquet(s"$dir/graphs")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val extra = Seq((10000L, vecs.find(_._1 == 0L).get._2.map(x => x + 0.001f)))
      .toDF("vec_id", "embedding")
    Similarity.hnswAppend(spark, dir, extra, "vec_id", "embedding", chunkBytes = 4096)
    val after = spark.read.parquet(s"$dir/graphs")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val touchedShard = (before diff after).map(_.split("shard_id=")(1).split("/")(0)).toSet
    assert((before intersect after).nonEmpty, "untouched shards must keep their files")
    assert(touchedShard.size === 1, s"exactly one shard rewrites, got $touchedShard")
    // the appended vector is now findable: it is its own nearest neighbor's
    // near-twin — query the original center row and expect 10000 in top-5
    val q0 = df.where(col("vec_id") === 0L)
    val found = Similarity.hnswQueryIndex(spark, dir, q0, "vec_id", "embedding",
        k = 5, efSearch = 32)
      .collect().map(_.getLong(1)).toSet
    assert(found.contains(10000L), s"appended vector must be served, got $found")
  }
}
