package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.operators.{GridRaster, PointPattern, Trajectory}
import graft.oracle.Derive

/** Round-5-late operator stress (32 cores) — the new spatial-statistics,
  * trajectory-mining and point-pattern families at two orders of magnitude
  * above the bench SF, verifying the documented plan shapes hold:
  *
  *   1. RASTER STATS at `nPts` points (default 256M): moransI, localMorans,
  *      getisOrd, sobel — each collapses the scan to the raster in exchange
  *      ONE, so all four should cost ≈ the scan+collapse, not the analytics.
  *   2. TRAJECTORY at `nFix` fixes over `nEnt` entities (default 64M/512k):
  *      stayPoints, cellTransitions, anchorCells, flagTeleports — each rides
  *      one entity-key exchange; wall should be flat across the four.
  *      NOTE: whichever family member runs FIRST in the shared JVM pays a
  *      ~4–15× warm-up premium (page-faulting the checkpointed input +
  *      JIT of the window codegen) — measured by reordering: anchorCells
  *      first = 59 s with stayPoints dropping to 21.7 s then 4.4 s on
  *      repeat; the plans are identical (one exchange each, PLANS.md).
  *      Compare members by their WARM runs, not by suite position.
  *   3. GEOFENCE at `nFix` fixes × `nFence` fences: the broadcast NLJ
  *      fan-out is the documented cost driver — wall ∝ fences.
  *   4. RIPLEY'S K at `nPp` points (default 8M, ~4 pts/cell at g = max r):
  *      ring-join candidate count ∝ density², bounded by construction.
  *
  * Usage: runMain graft.tools.Round5bStress [nPts] [nFix] [nEnt] [nFence] [nPp]
  */
object Round5bStress {
  def main(args: Array[String]): Unit = {
    val nPts = if (args.length > 0) args(0).toLong else 256000000L
    val nFix = if (args.length > 1) args(1).toLong else 64000000L
    val nEnt = if (args.length > 2) args(2).toLong else 512000L
    val nFence = if (args.length > 3) args(3).toInt else 64
    val nPp = if (args.length > 4) args(4).toLong else 8000000L
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[stress] $label: $out rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      System.gc()
    }

    // ---- 1. raster statistics family: hub-clustered points
    val id = col("id")
    val pts = spark.range(0, nPts).select(
      (Derive.lonMicro(id % 997L) + (id * 48271L) % 9000001L - 4500000L).as("lonm"),
      (Derive.latMicro(id % 997L) + ((id + 7L) * 16807L) % 9000001L - 4500000L).as("latm"))
    t(s"moransI ${nPts / 1000000}M pts")(
      GridRaster.moransI(pts, col("lonm"), col("latm"), 2000000L).count())
    t(s"localMorans ${nPts / 1000000}M pts")(
      GridRaster.localMorans(pts, col("lonm"), col("latm"), 2000000L).count())
    t(s"getisOrd ${nPts / 1000000}M pts")(
      GridRaster.getisOrd(pts, col("lonm"), col("latm"), 2000000L).count())
    t(s"sobel ${nPts / 1000000}M pts")(
      GridRaster.sobel(pts, col("lonm"), col("latm"), 2000000L).count())

    // ---- 2. trajectory family: nEnt entities × (nFix/nEnt) fixes each,
    //      slot-anchored so runs/stays/transitions are realistic
    val perEnt = nFix / nEnt
    val fx = spark.range(0, nFix).select(
      (id % nEnt).as("ent"), expr(s"id div $nEnt").as("seq"))
      .select(col("ent"), (col("seq") * 60000000L).as("tus"), col("seq").as("oid"),
        (Derive.lonMicro(col("ent") % 997L)
          + ((col("ent") * 31L + expr(s"seq div 32") * 7L) * 48271L) % 600001L - 300000L
          + (col("seq") * 7919L) % 200001L - 100000L).as("lonm"),
        (Derive.latMicro(col("ent") % 997L)
          + ((col("ent") * 17L + expr(s"seq div 32") * 11L) * 16807L) % 600001L - 300000L
          + ((col("seq") + 3L) * 104729L) % 200001L - 100000L).as("latm"))
      .localCheckpoint()
    t(s"stayPoints ${nFix / 1000000}M fixes / ${nEnt / 1000}k ents")(
      Trajectory.stayPoints(fx, col("ent"), col("tus"), col("oid"),
        col("lonm"), col("latm"), 400000L, 3600000000L, 3L).count())
    t(s"cellTransitions ${nFix / 1000000}M fixes")(
      Trajectory.cellTransitions(fx, col("ent"), col("tus"), col("oid"),
        col("lonm"), col("latm"), 400000L).count())
    t(s"anchorCells ${nFix / 1000000}M fixes")(
      Trajectory.anchorCells(fx, col("ent"), col("tus"), col("oid"),
        col("lonm"), col("latm"), 400000L, 3).count())
    t(s"flagTeleports ${nFix / 1000000}M fixes")(
      Trajectory.flagTeleports(fx, col("ent"), col("tus"), col("oid"),
        col("lonm"), col("latm"), 50L).count())

    // ---- 3. geofence: broadcast NLJ fan-out nFix × nFence
    val fences = spark.range(0, nFence).select(col("id").as("fence_id"),
      (Derive.lonMicro(col("id") % 997L) - 250000L).as("lon_min"),
      (Derive.latMicro(col("id") % 997L) - 250000L).as("lat_min"),
      (Derive.lonMicro(col("id") % 997L) + 250000L).as("lon_max"),
      (Derive.latMicro(col("id") % 997L) + 250000L).as("lat_max"))
    t(s"geofence ${nFix / 1000000}M fixes x $nFence fences")(
      Trajectory.geofenceEvents(fx, col("ent"), col("tus"), col("oid"),
        col("lonm"), col("latm"), fences).count())

    // ---- 4. Ripley's K at bounded density (~4 pts per g=rmax cell)
    val pp = spark.range(0, nPp).select(col("id").as("pid"),
      (Derive.lonMicro(id % 65536L) + (id * 48271L) % 4000001L - 2000000L).as("lonm"),
      (Derive.latMicro(id % 65536L) + ((id + 7L) * 16807L) % 4000001L - 2000000L).as("latm"))
    t(s"ripleyK ${nPp / 1000000}M pts")(
      PointPattern.ripleyK(pp, col("pid"), col("lonm"), col("latm"),
        Seq(250000L, 500000L, 1000000L)).count())

    spark.stop()
  }
}
