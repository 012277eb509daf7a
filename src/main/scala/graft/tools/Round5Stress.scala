package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.operators.Similarity
import graft.oracle.Derive
import graft.sources.IcebergLite

/** Round-5 operator stress (32 cores):
  *
  *   1. meters clip joins at 8M segments/features — should match the
  *      planar twins (the conversion lives inside the same per-pair
  *      kernel; zero extra plan nodes).
  *   2. HNSW at 1M synthetic 64-dim vectors: sharded build wall, then
  *      query-batch throughput against the persisted index (the
  *      build-once/query-many split a serving deployment actually has).
  *   3. IcebergLite merge-on-read vs copy-on-write point delete on an
  *      8M-row table: commit wall of each verb + the read-side cost the
  *      MoR debt adds, then compact-fold cost. This is the round's cost
  *      story: CoW pays at delete time, MoR pays (less, once) at
  *      compaction.
  *
  * Usage: runMain graft.tools.Round5Stress [nSegs] [nVecs] [nRows] [reps]
  */
object Round5Stress {
  def main(args: Array[String]): Unit = {
    val nSegs = if (args.length > 0) args(0).toLong else 8000000L
    val nVecs = if (args.length > 1) args(1).toLong else 1000000L
    val nRows = if (args.length > 2) args(2).toLong else 8000000L
    val reps = if (args.length > 3) args(3).toInt else 1
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def t[T](label: String)(body: => T): T = {
      var out: T = null.asInstanceOf[T]
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        out = body
        println(f"[stress] $label: $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        System.gc()
      }
      out
    }

    // ---- 1. meters clip joins (same synthetic rules as q74/q75)
    val k = col("id")
    val segs = spark.range(0, nSegs).select(k.as("seg_id"),
      Derive.lonMicro(k).as("x1"), Derive.latMicro(k).as("y1"),
      (Derive.lonMicro(k) + (k * 7919L) % 2000001L - 1000000L).as("x2"),
      (Derive.latMicro(k) + (k * 104729L) % 2000001L - 1000000L).as("y2"))
    for (u <- Seq("udeg", "meters"))
      t(s"clipLengthJoin $u over ${nSegs / 1000000}M segments -> zones") {
        graft.operators.SpatialJoin.clipLengthJoin(spark, segs, col("seg_id"),
          col("x1"), col("y1"), col("x2"), col("y2"), Derive.rectSpecs,
          unit = u).count()
      }
    val feats = spark.range(0, nSegs).select(k.as("fid"),
      (Derive.lonMicro(k) - (k * 6101L) % 1500001L).as("flo"),
      (Derive.latMicro(k) - (k * 9203L) % 1500001L).as("fla"),
      (Derive.lonMicro(k) + (k * 6101L) % 1500001L).as("fhi"),
      (Derive.latMicro(k) + (k * 9203L) % 1500001L).as("fha"))
    for (u <- Seq("udeg", "meters"))
      t(s"clipAreaJoin $u over ${nSegs / 1000000}M features -> zones") {
        graft.operators.SpatialJoin.clipAreaJoin(spark, feats, col("fid"),
          col("flo"), col("fla"), col("fhi"), col("fha"), Derive.rectSpecs,
          unit = u).count()
      }

    // ---- 1b. overview pyramid: base mosaic + every level to z=0 — the
    //      fold itself is O(tiles), geometric in levels
    t(s"tilePyramid z=6..0 over ${nSegs / 1000000}M images (base mosaic + 6 folds)") {
      val imgs = {
        val b = graft.fixtures.Fixtures.images(spark, math.min(nSegs, 1000000L))
        Seq.fill(math.max(1, (nSegs / math.min(nSegs, 1000000L)).toInt))(b)
          .reduce(_ unionByName _)
      }
      graft.operators.Multimodal.tilePyramid(imgs, z = 6, zMin = 0).count()
    }

    // ---- 2. HNSW at 1M vectors: 32 shards ≈ 31k nodes each
    //      (deterministic splitmix components in [-1, 1])
    val dims = 64
    val vecs = spark.range(0, nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (xxhash64(col("id") * lit(dims.toLong) + d.cast("long")) % 1000001L)
          .cast("float") / lit(1000000.0f)).as("embedding"))
    val queries = vecs.where(col("vec_id") % (nVecs / 1000) === 0) // ~1000 queries
    val idx = java.nio.file.Files.createTempDirectory("graft_hnsw_stress").toString
    t(s"hnswBuildSave over ${nVecs / 1000}k vectors (32 shards, m=16, efC=100)") {
      Similarity.hnswBuildSave(spark, vecs, "vec_id", "embedding", idx, shards = 32)
    }
    t(s"hnswQueryIndex: 1000-query batch, k=10, ef=64 (persisted graphs)") {
      Similarity.hnswQueryIndex(spark, idx, queries, "vec_id", "embedding",
        k = 10, efSearch = 64).count()
    }

    // ---- 3. MoR vs CoW point delete on an 8M-row table (16 data files)
    def freshTable(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_iclite_stress").toString
      val rows = spark.range(0, nRows).select(col("id"),
        Derive.lonMicro(col("id")).as("lonm"), Derive.latMicro(col("id")).as("latm"))
        .repartition(16)
      IcebergLite.append(spark, dir, rows, col("lonm"))
      dir
    }
    val cow = freshTable()
    t(s"CoW deleteWhere of 1 key in ${nRows / 1000000}M rows (rewrites the hit file)") {
      IcebergLite.deleteWhere(spark, cow, col("id") === 12345L, col("lonm"))
    }
    val mor = freshTable()
    t(s"MoR deleteWhereMoR of 1 key in ${nRows / 1000000}M rows (writes one key row)") {
      IcebergLite.deleteWhereMoR(spark, mor, col("id") === 12345L, "id")
    }
    t("read WITH MoR debt (one anti-join generation)") {
      IcebergLite.read(spark, mor).count()
    }
    t("compact folds the MoR debt") {
      IcebergLite.compact(spark, mor, targetFileRows = nRows)
    }
    t("read after fold (no anti-join)") {
      IcebergLite.read(spark, mor).count()
    }
    spark.stop()
  }
}
