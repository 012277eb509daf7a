package graft.tools

import org.apache.spark.sql.functions._
import graft.{BenchCore}
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin

/** Ad-hoc stage profiler for the flagship pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val n = if (args.length > 1) args(1).toLong else 1000000L
    val spark = BenchCore.session(cpus)
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))

    def t(name: String)(body: => Any): Unit =
      println(f"$name%-28s ${BenchCore.medianTime(3)(body)}%.3f s")

    t("scan phash only") { imgs.agg(max("phash")).collect() }
    t("scan + lon/lat") { imgs.agg(max("lon"), max("lat")).collect() }
    t("scan + zcell x4") {
      imgs.select((4 to 16 by 4).map(z => zcell(col("lon"), col("lat"), z).as(s"z$z")): _*)
        .agg(max("z4"), max("z8"), max("z12"), max("z16")).collect()
    }
    val joined = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons)
    t("full join") { joined.agg(count(lit(1))).collect() }
    t("join + tiles") {
      SpatialJoin.assignTiles(joined, col("lon"), col("lat"), 12)
        .agg(count(lit(1)), sum("tile_x"), sum("tile_y")).collect()
    }
    println("=== executed plan (join + tiles) ===")
    println(SpatialJoin.assignTiles(joined, col("lon"), col("lat"), 12)
      .agg(count(lit(1)), sum("tile_x"), sum("tile_y")).queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
