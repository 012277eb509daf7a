package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin

/** Throwaway: which flagship stage stops scaling with cores? */
object ScaleBisect {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val n = if (args.length > 1) args(1).toLong else 8000000L
    val spark = BenchCore.session(cpus)
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    def t(tag: String)(body: => Any): Unit =
      println(f"BISECT cpus=$cpus $tag%-12s ${BenchCore.medianTime(3)(body)}%.3f s")
    t("scan_sum") { imgs.agg(max("phash")).collect() }
    t("zcell") { imgs.select(zcell(col("lon"), col("lat"), 12).as("z")).agg(max("z")).collect() }
    t("explode3") {
      val cells = array(Seq(8, 12, 16).map(z =>
        struct(lit(z).as("l"), zcell(col("lon"), col("lat"), z).as("c"))): _*)
      imgs.withColumn("_lc", explode(cells))
        .agg(max(col("_lc.c"))).collect()
    }
    t("join") {
      SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons)
        .agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
