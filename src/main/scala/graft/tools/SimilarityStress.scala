package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Rand
import graft.operators.Similarity

/** LSH near-dup at corpus scale (beyond the exact path's broadcast cap):
  * 200k 64-dim vectors, every 100th a planted near-dup of its predecessor
  * (cos ≥ ~0.95). Runs `cosineNearDupPairsLsh` at t=0.9 in the selective
  * regime (planes=8 ⇒ ~2^-8 of pairs collide per table) and reports
  * runtime + recall of planted pairs (theory: per-pair miss
  * (1−0.899^8)^tables ≈ 1.2% at tables=8).
  */
object SimilarityStress {
  def vec(i: Long, dims: Int): Array[Float] = {
    if (i % 100 == 1 && i > 0) {
      // near-dup of i-1: same direction + small deterministic perturbation
      val base = vec(i - 1, dims)
      Array.tabulate(dims) { d =>
        base(d) + 0.06f * (Rand.unit(Rand.mix(i * 31 + d)) - 0.5).toFloat
      }
    } else
      Array.tabulate(dims) { d =>
        (Rand.unit(Rand.mix(i * 131 + d * 7)) * 2.0 - 1.0).toFloat
      }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val dims = 64
    val spark = BenchCore.session("32")
    import spark.implicits._
    val df = spark.range(n).as[Long].map(i => (i, vec(i, dims)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val planted = df.sparkSession.range(1, n, 100).count()
    val t0 = System.nanoTime
    val planes = if (args.length > 1) args(1).toInt else 12
    val tables = if (args.length > 2) args(2).toInt else 12
    val pairs = Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding",
        threshold = 0.9, dims = dims, planes = planes, tables = tables, maxBucket = 10000L)
      .localCheckpoint()
    val total = pairs.count()
    val t = (System.nanoTime - t0) / 1e9
    val found = pairs.where(col("id_b") === col("id_a") + 1 && col("id_b") % 100 === 1).count()
    println(f"SIMSTRESS n=$n P=$planes T=$tables pairs=$total planted=$planted found=$found " +
      f"recall=${found.toDouble / planted}%.4f time=$t%.1f s")
    spark.stop()
  }
}
