package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.Knn

/** kNN at scale: k=20 neighbours for 256 query points over the 8M-row
  * image table (dense-city skew), ring-expansion join.
  */
object KnnStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session("32")
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
      .withColumn("id", monotonically_increasing_id())
    val rnd = new scala.util.Random(9)
    val queries = (0L until 256L).map(q => Knn.QueryPt(q,
      rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L))
    val t0 = System.nanoTime
    val res = Knn.knnJoin(spark, imgs, col("id"), col("lon"), col("lat"),
      queries, k = 20, level = 8, cellPrefilter = false)
    val cnt = res.count()
    println(f"KNNSTRESS points=$n queries=256 k=20 rows=$cnt time=${(System.nanoTime - t0) / 1e9}%.1f s")

    // DataFrame-valued query side: 100k queries (a tile-serving-scale set
    // no driver Seq should hold) — distributed rings + per-round retirement
    val nq = if (args.length > 1) args(1).toLong else 100000L
    val qdf = spark.range(nq).select(col("id").as("qid"),
        (pmod(hash(col("id")), lit(340000000L)) - 170000000L).cast("long").as("qlon"),
        (pmod(hash(col("id"), lit(1)), lit(160000000L)) - 80000000L).cast("long").as("qlat"))
    val t1 = System.nanoTime
    val res2 = Knn.knnJoinDf(spark, imgs, col("id"), col("lon"), col("lat"),
      qdf, col("qid"), col("qlon"), col("qlat"), k = 20, level = 8)
    val cnt2 = res2.count()
    println(f"KNNSTRESS_DF points=$n queries=$nq k=20 rows=$cnt2 time=${(System.nanoTime - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
