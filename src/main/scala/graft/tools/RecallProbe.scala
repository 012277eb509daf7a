package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN recall measurement over the driver embeddings table — used to pick
  * honest parameters for the q49/q53 driver-checked recall bounds (the
  * bound must hold at every SF the driver runs, with margin).
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir> [k]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val q = emb.where(col("vec_id") % 100 === 0)
    println(s"corpus=${emb.count()} queries=${q.count()} k=$k")

    def recall(ann: org.apache.spark.sql.DataFrame,
               exact: org.apache.spark.sql.DataFrame): Double = {
      val e = exact.select("qid", "nid")
      val h = e.join(ann.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
      h.toDouble / e.count()
    }

    val exactDot = Similarity.topKDot(emb, q, "vec_id", "embedding", k).cache()
    for ((pl, tb) <- Seq((4, 16), (3, 16), (2, 16), (4, 24), (3, 24), (4, 32))) {
      val r = recall(Similarity.annTopK(spark, emb, q, "vec_id", "embedding",
        k, dims = 64, planes = pl, tables = tb), exactDot)
      println(f"annTopK planes=$pl tables=$tb recall=$r%.3f")
    }
    val exactL2 = Similarity.topKL2(emb, q, "vec_id", "embedding", k).cache()
    for ((np, lr) <- Seq((12, 2), (16, 0), (16, 2), (16, 3), (20, 2), (24, 2))) {
      val r = recall(Similarity.ivfTopK(spark, emb, q, "vec_id", "embedding",
        k, nprobe = np, lloydRounds = lr), exactL2)
      println(f"ivfTopK nprobe=$np lloyd=$lr recall=$r%.3f")
    }
    spark.stop()
  }
}
