package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.Fixtures
import graft.operators.SpatialJoin

/** Skew diagnosis: physical join node + per-stage max/median task time for
  * the planted-skew join. runMain graft.tools.SkewProbe [n] [cpus] [mode]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val cpus = if (args.length > 1) args(1) else "32"
    val mode = if (args.length > 2) args(2) else "naive"
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // the skew scenario is a TABLE-SIZED build side (at 10^12 rows the
      // polygon/cover side no longer broadcasts) — disable Spark's
      // auto-broadcast in both planner and AQE so the join actually
      // shuffles; otherwise BroadcastHashJoin hides the skew entirely
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", (mode == "aqe").toString)
      .config("spark.ui.enabled", "false")
    if (mode == "aqe") {
      b.config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = Fixtures.skewPoints(spark, n).persist()
    pts.count()
    val salt = if (mode == "salted") 8 else 1
    val df = SpatialJoin.join(spark, pts, col("lonm"), col("latm"), Fixtures.polygons,
        broadcastThreshold = 0L, saltBuckets = salt)
      .agg(count(lit(1)).as("rows"), sum(col("id")).as("checksum"))

    val taskTimes = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskTimes.synchronized {
            taskTimes.getOrElseUpdate(t.stageId, scala.collection.mutable.ArrayBuffer.empty) +=
              ((t.taskMetrics.executorRunTime, t.taskMetrics.shuffleReadMetrics.recordsRead))
          }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val res = df.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(l)
    println(s"SKEWPROBE mode=$mode rows=${res(0).getLong(0)} wall=${f"$wall%.1f"}s")
    println("SKEWPROBE plan: " + df.queryExecution.executedPlan.toString
      .linesIterator.filter(s => s.contains("Join") || s.contains("Exchange"))
      .map(_.trim.take(100)).mkString(" | "))
    taskTimes.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
      val s = ts.map(_._1).sorted
      val r = ts.map(_._2).sorted
      if (s.nonEmpty && s.last > 500)
        println(s"SKEWPROBE stage=$sid tasks=${s.length} median=${s(s.length / 2)}ms max=${s.last}ms " +
          s"recs(min/med/max)=${r.head}/${r(r.length / 2)}/${r.last}")
    }
    spark.stop()
  }
}
