package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.Multimodal
import graft.oracle.Derive

/** Throwaway: per-stage task-time breakdown of zonalStats at 8M. */
object ZonalProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val rep = if (args.length > 1) args(1).toInt else 8
    val spark = BenchCore.session(cpus)
    val base = Fixtures.images(spark, 1000000L)
    val imgs = Seq.fill(rep)(base).reduce(_ unionByName _)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = i.completionTime.get - i.submissionTime.get
        println(f"STAGE ${i.stageId}%3d tasks=${i.numTasks}%3d wall=${wall / 1000.0}%6.2fs " +
          f"runSum=${m.executorRunTime / 1000.0}%7.2fs cpuSum=${m.executorCpuTime / 1e9}%7.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%5.2fs shR=${m.shuffleReadMetrics.recordsRead} " +
          f"shW=${m.shuffleWriteMetrics.recordsWritten}")
      }
    }
    def job() = Multimodal.zonalStats(spark, imgs, Derive.rectSpecs).collect()
    job() // warmup
    println("=== timed run ===")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime
    job()
    println(f"TOTAL ${(System.nanoTime - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
