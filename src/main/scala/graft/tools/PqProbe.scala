package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Phase timing for the PQ index path: build vs query vs exact twin.
  * runMain graft.tools.PqProbe [sfDir] [cpus]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = graft.BenchCore.session(cpus)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    println(s"PQPROBE n=${emb.count()}")
    val q = emb.where(col("vec_id") % 100 === 0)
    println(s"PQPROBE queries=${q.count()}")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"PQPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val idx = java.nio.file.Files.createTempDirectory("pq_probe").toString
    t("pq_build") { Similarity.ivfPqBuildSave(spark, emb, "vec_id", "embedding", idx, lloydRounds = 2) }
    t("pq_query") { Similarity.ivfPqQueryIndex(spark, idx, emb, q, "vec_id", "embedding",
      k = 10, nprobe = 24, rerankC = 100).count() }
    val idx2 = java.nio.file.Files.createTempDirectory("flat_probe").toString
    t("flat_build") { Similarity.ivfBuildSave(spark, emb, "vec_id", "embedding", idx2, lloydRounds = 2) }
    t("flat_query") { Similarity.ivfQueryIndex(spark, idx2, q, "vec_id", "embedding",
      k = 10, nprobe = 24).count() }
    t("exact_twin") { Similarity.topKL2(emb, q, "vec_id", "embedding", k = 10).count() }
    // recall of both index paths vs exact L2 (the q6a/q6f bound)
    val exact = Similarity.topKL2(emb, q, "vec_id", "embedding", k = 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    println(f"PQPROBE recall_flat ${recall(Similarity.ivfQueryIndex(spark, idx2, q, "vec_id", "embedding", k = 10, nprobe = 24))}%.3f")
    println(f"PQPROBE recall_pq   ${recall(Similarity.ivfPqQueryIndex(spark, idx, emb, q, "vec_id", "embedding", k = 10, nprobe = 24, rerankC = 100))}%.3f")
    println(f"PQPROBE recall_pq_c200 ${recall(Similarity.ivfPqQueryIndex(spark, idx, emb, q, "vec_id", "embedding", k = 10, nprobe = 24, rerankC = 200))}%.3f")
    spark.stop()
  }
}
