package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.Fixtures
import graft.operators.SpatialJoin

/** Planted-skew shuffle-join bench: the same point⋈polygon join over a
  * table with ~50% of rows in ONE cover cell (Fixtures.skewPoints), run
  * under three plans. Fresh JVM per mode — the toggles are session-wide.
  *
  *   runMain graft.tools.SkewBench <naive|aqe|salted> [n] [cpus] [runs] [hotFrac]
  *
  *   naive  — sort-merge shuffle join, AQE skew handling OFF: the hot key
  *            lands in one task (the straggler baseline)
  *   aqe    — same join, AQE skewJoin ON (runtime split of oversized
  *            partitions; thresholds lowered so the 64M-row fixture
  *            actually trips them — production sizes trip the defaults)
  *   salted — explicit 8-way salt of the cover side + pmod bucket on the
  *            point side (SpatialJoin saltBuckets), skew handled at plan
  *            time; AQE skewJoin off to isolate the effect
  *
  * Prints one JSON line; the mode table lives in BENCH/BASELINE.md.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val n = if (args.length > 1) args(1).toLong else 64000000L
    val cpus = if (args.length > 2) args(2) else "32"
    val runs = if (args.length > 3) args(3).toInt else 3
    val hotFrac = if (args.length > 4) args(4).toInt else 50
    require(Set("naive", "aqe", "salted").contains(mode), s"unknown mode $mode")

    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-skew-$mode")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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

    // generation excluded from timing: materialize the skewed table once
    val pts = Fixtures.skewPoints(spark, n, hotFrac)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()
    val (steal0, busy0) = graft.BenchCore.cpuJiffies()

    val salt = if (mode == "salted") 8 else 1
    def job(): Unit = {
      // broadcastThreshold=0 forces the SHUFFLE join — skew is a shuffle
      // phenomenon; the broadcast plan (the flagship default) never sees it
      SpatialJoin.join(spark, pts, col("lonm"), col("latm"), Fixtures.polygons,
          broadcastThreshold = 0L, saltBuckets = salt)
        .agg(count(lit(1)).as("rows"), sum(col("id")).as("checksum"))
        .collect()
    }
    val t = graft.BenchCore.medianTime(runs)(job())
    val (steal1, busy1) = graft.BenchCore.cpuJiffies()
    val stealPct =
      if (busy1 > busy0)
        100.0 * (steal1 - steal0) / math.max(1L, (steal1 - steal0) + (busy1 - busy0))
      else 0.0
    println(s"""{"bench":"skew","mode":"$mode","n":$n,"hot_frac_pct":$hotFrac,""" +
      s""""median_sec":${f"$t%.3f"},"mrows_per_sec":${f"${n / t / 1e6}%.3f"},""" +
      s""""host_steal_pct":${f"$stealPct%.1f"},"cpus":"$cpus"}""")
    spark.stop()
  }
}
