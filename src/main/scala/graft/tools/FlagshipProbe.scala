package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin

/** Throwaway: split flagship wall-clock into driver cover vs spark job. */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val n = if (args.length > 1) args(1).toLong else 8000000L
    val spark = BenchCore.session(cpus)
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))

    def once(tag: String): Unit = {
      val t0 = System.nanoTime
      val cover = SpatialJoin.cover(Fixtures.polygons)
      val t1 = System.nanoTime
      val joined = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons)
      val t2 = System.nanoTime
      SpatialJoin.assignTiles(joined, col("lon"), col("lat"), 12)
        .agg(count(lit(1)).as("rows"), sum(col("tile_x")).as("cx"), sum(col("tile_y")).as("cy"))
        .collect()
      val t3 = System.nanoTime
      println(f"$tag cover=${(t1 - t0) / 1e9}%.3f build=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f (cover cells: ${cover.rows.size})")
    }
    once("warmup")
    once("run1  ")
    once("run2  ")
    once("run3  ")
    spark.stop()
  }
}
