package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.operators.Dedup

/** Throwaway: per-stage breakdown of q44 (prefix-filtered n-gram Jaccard)
  * at sf0.1.
  */
object ProbeQ44 {
  def main(args: Array[String]): Unit = {
    val spark = BenchCore.session("32")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def run() = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5).count()
    run() // warmup
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = i.completionTime.get - i.submissionTime.get
        println(f"STAGE ${i.stageId}%3d [${i.name.takeWhile(_ != '\n').take(50)}] tasks=${i.numTasks}%3d " +
          f"wall=${wall / 1000.0}%6.2fs runSum=${m.executorRunTime / 1000.0}%7.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%5.2fs shW=${m.shuffleWriteMetrics.recordsWritten}")
      }
    }
    println("=== timed ===")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime
    val n = run()
    println(f"TOTAL ${(System.nanoTime - t0) / 1e9}%.2f s, pairs=$n")
    Thread.sleep(500)
    spark.stop()
  }
}
