package graft.tools

import org.apache.spark.sql.functions._

/** Round-5-late operator stress at synthetic scale (the Round4/5Stress
  * pattern): each op on deterministically generated inputs far above the
  * driver SF — 8M points for the raster family, 2M segments for dissolve,
  * 2M fixes for Viterbi, 1M×20k for the accessibility pair.
  *   runMain graft.tools.Round5cStress [cpus]
  */
object Round5cStress {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val spark = graft.BenchCore.session(cpus)
    import spark.implicits._

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"STRESS $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }

    // 8M clustered points (200 hubs, +-4.5e6 scatter) — the raster family
    val pts = spark.range(8000000L).select(
      (((col("id") % 200L) * 2654435761L) % 340000000L - 170000000L
        + (col("id") * 48271L) % 9000001L - 4500000L).as("x"),
      (((col("id") % 200L) * 2246822519L) % 160000000L - 80000000L
        + ((col("id") + 7L) * 16807L) % 9000001L - 4500000L).as("y"))
      .localCheckpoint()

    time("kde_8m_bw3") {
      graft.operators.GridRaster.kde(pts, col("x"), col("y"),
        cellMicro = 500000L, bandwidthCells = 3).count()
    }
    time("kde_8m_bw8") {
      graft.operators.GridRaster.kde(pts, col("x"), col("y"),
        cellMicro = 500000L, bandwidthCells = 8).count()
    }
    time("focal_median_8m") {
      graft.operators.GridRaster.focalMedian(pts, col("x"), col("y"),
        cellMicro = 500000L).count()
    }
    time("flow_accum_8m") {
      graft.operators.GridRaster.flowAccumulation(pts, col("x"), col("y"),
        cellMicro = 500000L, maxIters = 128).count()
    }
    time("zonal_majority_8m") {
      graft.operators.GridRaster.zonalMajority(spark, pts, col("x"), col("y"),
        cellMicro = 500000L, thresholds = Seq(2L, 8L, 32L),
        specs = graft.oracle.Derive.rectSpecs).count()
    }

    // 2M-segment network (40k chains x 50) — dissolve
    val segs = spark.range(2000000L).select(col("id"),
      (((col("id") % 40000L) * 2654435761L) % 340000000L - 170000000L
        + expr("id div 40000") * 300L).as("x1"),
      (((col("id") % 40000L) * 2246822519L) % 160000000L - 80000000L
        + (expr("id div 40000") * 16807L) % 80001L - 40000L).as("y1"),
      (((col("id") % 40000L) * 2654435761L) % 340000000L - 170000000L
        + (expr("id div 40000") + 1L) * 300L).as("x2"),
      (((col("id") % 40000L) * 2246822519L) % 160000000L - 80000000L
        + ((expr("id div 40000") + 1L) * 16807L) % 80001L - 40000L).as("y2"))
      .where((col("id") * 7919L) % 11L =!= 0L)
      .localCheckpoint()
    time("dissolve_1p8m_segments") {
      graft.operators.Dissolve.dissolveSegments(segs, col("id"),
        col("x1"), col("y1"), col("x2"), col("y2")).count()
    }

    // 2M fixes / 50k entities x 40, two parallel roads per 10k hubs — viterbi
    val vfx = spark.range(2000000L).select(
      (col("id") % 50000L).as("ent"), expr("id div 50000").as("tus"),
      col("id").as("oid"),
      (((col("id") % 50000L % 10000L) * 2654435761L) % 340000000L
        - 170000000L + expr("id div 50000") * 20000L).as("x"),
      (((col("id") % 50000L % 10000L) * 2246822519L) % 160000000L
        - 80000000L + (col("id") * 104729L) % 30001L - 15000L).as("y"))
      .localCheckpoint()
    val vsg = spark.range(20000L).select(col("id").as("sid"),
      (((col("id") % 10000L) * 2654435761L) % 340000000L - 170000000L
        - 50000L).as("x1"),
      (((col("id") % 10000L) * 2246822519L) % 160000000L - 80000000L
        + (col("id") % 2L) * 20000L - 10000L).as("y1"),
      (((col("id") % 10000L) * 2654435761L) % 340000000L - 170000000L
        + 850000L).as("x2"),
      (((col("id") % 10000L) * 2246822519L) % 160000000L - 80000000L
        + (col("id") % 2L) * 20000L - 10000L).as("y2"))
      .localCheckpoint()
    time("viterbi_2m_fixes") {
      graft.operators.MapMatch.viterbiMatch(spark, vfx, col("ent"),
        col("tus"), col("oid"), col("x"), col("y"),
        vsg, col("sid"), col("x1"), col("y1"), col("x2"), col("y2"),
        radiusMicro = 40000L, level = 13, switchPenalty = 800000000L).count()
    }

    // 1M demand x 20k sites — the accessibility pair
    val dem = spark.range(1000000L).select(col("id"),
      (((col("id") % 300L) * 2654435761L) % 340000000L - 170000000L
        + (col("id") * 48271L) % 9000001L - 4500000L).as("x"),
      (((col("id") % 300L) * 2246822519L) % 160000000L - 80000000L
        + ((col("id") + 7L) * 16807L) % 9000001L - 4500000L).as("y"),
      ((col("id") % 97L) + 1L).as("pop")).localCheckpoint()
    val sit = spark.range(20000L).select(col("id").as("sid"),
      (((col("id") % 300L) * 2654435761L) % 340000000L - 170000000L
        + (col("id") * 7919L) % 9000001L - 4500000L).as("x"),
      (((col("id") % 300L) * 2246822519L) % 160000000L - 80000000L
        + ((col("id") + 3L) * 104729L) % 9000001L - 4500000L).as("y"),
      (((col("id") % 13L) + 1L) * 1000L).as("cap")).localCheckpoint()
    time("twoStepFca_1m_x_20k") {
      graft.operators.Accessibility.twoStepFca(spark,
        dem, col("id"), col("x"), col("y"), col("pop"),
        sit, col("sid"), col("x"), col("y"), col("cap"),
        radiusMicro = 2000000L, level = 8).count()
    }
    time("huff_1m_x_20k") {
      graft.operators.Accessibility.huffAllocation(spark,
        dem, col("id"), col("x"), col("y"), col("pop"),
        sit, col("sid"), col("x"), col("y"), col("cap"),
        radiusMicro = 2000000L, level = 8, distQ = 1000000000L).count()
    }

    // 8M-image narrow kernels — histogram / dHash / Otsu
    val imgs = graft.fixtures.Fixtures.images(spark, 1000000L)
    val imgs8 = Seq.fill(8)(imgs).reduce(_ union _)
    time("luma_hist_8m_images") {
      graft.operators.Multimodal.lumaHistogram(imgs8)
        .agg(sum("collision")).count()
    }
    time("dhash_8m_images") {
      graft.operators.Multimodal.dHash(imgs8)
        .agg(sum(expr("dhash % 1000003"))).count()
    }
    time("otsu_8m_images") {
      graft.operators.Multimodal.otsuThreshold(imgs8)
        .groupBy("otsu_t").count().count()
    }
    spark.stop()
  }
}
