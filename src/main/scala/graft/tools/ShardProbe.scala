package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.operators.Similarity

/** Throwaway: two-stage IVF recall vs coarseProbe at a given SF. */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = BenchCore.session("16")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.where(col("vec_id") % 100 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_probe").toString
    val nl = Similarity.ivfBuildSave(spark, emb, "vec_id", "embedding", idx, lloydRounds = 2)
    val exact = Similarity.topKL2(emb, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (cp <- Seq(2, 3, 4, 5, 6, 8); np <- Seq(24)) {
      val ann = Similarity.ivfQueryIndexSharded(spark, idx, q, "vec_id", "embedding",
          k = 10, nprobe = np, coarseProbe = cp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = exact.count(ann.contains).toDouble / exact.size
      println(f"[probe] nlist=$nl coarseProbe=$cp nprobe=$np recall=$rec%.3f")
    }
    val flat = Similarity.ivfQueryIndex(spark, idx, q, "vec_id", "embedding",
        k = 10, nprobe = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[probe] flat nprobe=24 recall=${exact.count(flat.contains).toDouble / exact.size}%.3f")
    spark.stop()
  }
}
