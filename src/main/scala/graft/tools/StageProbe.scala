package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin

/** Throwaway: per-stage task-time breakdown of the flagship join. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val n = if (args.length > 1) args(1).toLong else 8000000L
    val spark = BenchCore.session(cpus)
    val imgs = Fixtures.images(spark, n)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = i.completionTime.get - i.submissionTime.get
        println(f"STAGE ${i.stageId}%3d tasks=${i.numTasks}%3d wall=${wall / 1000.0}%6.2fs " +
          f"runSum=${m.executorRunTime / 1000.0}%7.2fs cpuSum=${m.executorCpuTime / 1e9}%7.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%5.2fs deser=${m.executorDeserializeTime / 1000.0}%5.2fs " +
          f"out=${m.outputMetrics.recordsWritten} shW=${m.shuffleWriteMetrics.recordsWritten}")
      }
    }
    def join() = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons)
      .agg(count(lit(1)))
    join().collect() // warmup
    println(s"=== timed run (cpus=$cpus, n=$n) ===")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime
    val cnt = join().collect()(0).getLong(0)
    println(f"TOTAL ${(System.nanoTime - t0) / 1e9}%.2f s, joined rows = $cnt")
    Thread.sleep(500)
    spark.stop()
  }
}
