package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.TextAnalysis

/** Mergeable-sketch aggregates at scale: heavy-hitters vocab + KLL
  * quantiles over the 8M-row image table's captions/phash.
  */
object SketchStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session("32")
    val imgs = Fixtures.images(spark, n)
    val t0 = System.nanoTime
    val vocab = TextAnalysis.vocabSketch(imgs, col("caption"), col("fmt"), k = 500, m = 20)
    val vRows = vocab.count()
    val t1 = System.nanoTime
    val med = graft.api.Reducer.on(imgs)
      .aggregateBy("fmt", col("fmt"))
      .sketchQuantile(col("w").cast("double"), 0.5)
    val mRows = med.count()
    val t2 = System.nanoTime
    println(f"SKETCHSTRESS n=$n vocab_rows=$vRows vocab=${(t1 - t0) / 1e9}%.1f s " +
      f"kll_rows=$mRows kll=${(t2 - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
