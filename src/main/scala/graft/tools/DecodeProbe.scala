package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.{Fixtures, ImageCodec}

/** Per-format decode throughput probe: times a bare decode+checksum pass
  * over the fixture table restricted to one fmt at a time — attributes the
  * raster ops' wall-clock to the actual codec, not the surrounding plan.
  *
  * Usage: runMain graft.tools.DecodeProbe [nImages] [replicate]
  */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val rep = if (args.length > 1) args(1).toInt else 1
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val base = Fixtures.images(spark, n)
    val imgs = Seq.fill(rep)(base).reduce(_ unionByName _)

    for (fmt <- Seq("raw", "png", "webp")) {
      val sub = imgs.where(col("fmt") === fmt)
        .select("bytes", "w", "h", "fmt").localCheckpoint()
      val cnt = sub.count()
      val t = BenchCore.medianTime(3) {
        sub.mapPartitions { it =>
          var acc = 0L
          it.foreach { r =>
            val px = ImageCodec.decode(r.getAs[Array[Byte]](0), r.getString(3),
              r.getInt(1), r.getInt(2))
            acc += px(0) & 0xff
          }
          Iterator.single(acc)
        }.reduce(_ + _)
      }
      println(f"[probe] fmt=$fmt rows=$cnt decode+checksum: $t%.1f s (${cnt / t / 1000}%.0f k imgs/s)")
    }
    spark.stop()
  }
}
