package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.operators.Dedup

/** Worst-case dedup stress: replicate the sf0.1 corpus K times with id
  * offsets — every text then has K exact copies, so every LSH bucket holds
  * K-cliques and the true-pair count is K²-quadratic. Measures the
  * operator's behaviour under maximal duplication (the regime dedup
  * actually targets at web scale).
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toInt else 10
    val spark = BenchCore.session("32")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
    val n = docs.count()
    val t0 = System.nanoTime
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), 3, 0.5)
    val np = pairs.count()
    val t1 = System.nanoTime
    val clusters = Dedup.dupClusters(pairs)
    val nc = clusters.select("cluster_id").distinct().count()
    val t2 = System.nanoTime
    println(f"STRESS docs=$n pairs=$np lsh_s=${(t1 - t0) / 1e9}%.1f " +
      f"clusters=$nc cc_s=${(t2 - t1) / 1e9}%.1f")
    spark.stop()
  }
}
