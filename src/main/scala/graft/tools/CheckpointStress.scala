package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin
import graft.plans.CheckpointedRun

/** Checkpointed flagship tiling at 8M rows: first attempt covers half the
  * buckets, resume covers the rest — reports per-attempt wall time and the
  * resume's recompute fraction (should re-read ~the pending half only,
  * since bucket pruning happens before the join).
  */
object CheckpointStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val buckets = if (args.length > 1) args(1).toInt else 16
    val spark = BenchCore.session("32")
    val out = java.nio.file.Files.createTempDirectory("ckpt_stress").toString
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val polys = Fixtures.polygons
    val tile: DataFrame => DataFrame = df => {
      val j = SpatialJoin.join(spark, df, col("lon"), col("lat"), polys)
      SpatialJoin.assignTiles(j, col("lon"), col("lat"), 12)
        .groupBy("_bucket", "poly_id", "tile_z", "tile_x", "tile_y")
        .agg(count(lit(1)).as("cnt"))
    }
    val t0 = System.nanoTime
    CheckpointedRun.runAttempt(spark, imgs, col("phash"), tile, buckets, out, "stress",
      maxBuckets = buckets / 2)
    val t1 = System.nanoTime
    val res = CheckpointedRun.runToCompletion(spark, imgs, col("phash"), tile, buckets, out, "stress")
    val t2 = System.nanoTime
    val rows = res.count()
    println(f"CKPTSTRESS n=$n buckets=$buckets half1=${(t1 - t0) / 1e9}%.1f s " +
      f"resume=${(t2 - t1) / 1e9}%.1f s out_rows=$rows")
    spark.stop()
  }
}
