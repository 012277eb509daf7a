package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.{Knn, SpatialJoin}

/** Round-3 operator stress at the 8M-row fixture scale (32 cores):
  *   1. distributed-polygon-side join (joinDf) vs the driver-cover join —
  *      row-count parity + wall-clock of each;
  *   2. haversine radius join over the full image table (geodesic metric
  *      at scale: wrapped rings + codegen haversine filter);
  *   3. DataFrame kNN with the heap top-k (the no-sort plan) at 8M points.
  *
  * Usage: runMain graft.tools.Round3Stress [nRows]
  */
object Round3Stress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))

    def t(label: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[stress] $label: $out rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    val cBase = t("driver-cover join (8M x polygons)") {
      SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons).count()
    }
    val cDf = t("distributed-cover joinDf (8M x polygons)") {
      SpatialJoin.joinDf(spark, imgs, col("lon"), col("lat"),
        Fixtures.polygonsDf(spark, Fixtures.polygons)).count()
    }
    require(cBase == cDf, s"joinDf parity broke at scale: $cBase vs $cDf")

    val queries = spark.range(0, 64)
      .select(col("id").as("qid"),
        (col("id") * 5312500L - 170000000L).as("lonm"),
        (col("id") * 2437500L - 78000000L).as("latm"))
    t("haversine radius join (8M points x 64 queries, r=500km)") {
      Knn.radiusJoinDf(spark, imgs, col("image_id"), col("lon"), col("lat"),
        queries, col("qid"), col("lonm"), col("latm"),
        level = 6, metric = "haversine", radiusMeters = 500000.0).count()
    }
    t("heap-topk kNN DataFrame join (8M points, 64 queries, k=10)") {
      // long ids → the k-heap aggregate path (string ids fall back to the
      // window; the heap is the at-scale plan being measured here)
      Knn.knnJoinDf(spark, imgs.withColumn("iid", xxhash64(col("image_id"))),
        col("iid"), col("lon"), col("lat"),
        queries, col("qid"), col("lonm"), col("latm"), k = 10, level = 6).count()
    }
    spark.stop()
  }
}
