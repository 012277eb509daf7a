package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** unionAreaJoin vs exact lattice rasterization (small integer coords make
  * unit-cell counting an exact independent reference), plus cell-size
  * invariance (the disjoint-grid decomposition must not change the answer)
  * and hand-built overlap algebra.
  */
class UnionAreaSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** Exact union area by unit-cell rasterization (half-open rects). */
  private def raster(rs: Seq[(Long, Long, Long, Long)],
                     zone: (Long, Long, Long, Long)): Long = {
    val (zlo, zla, zhi, zha) = zone
    var area = 0L
    var x = zlo
    while (x < zhi) {
      var y = zla
      while (y < zha) {
        if (rs.exists(r => r._1 <= x && x < r._3 && r._2 <= y && y < r._4)) area += 1
        y += 1
      }
      x += 1
    }
    area
  }

  test("hand case: two overlapping rects + one disjoint, clipped at the zone edge") {
    // zone [0,100)x[0,100); A=[10,20)x[10,30), B=[15,40)x[20,50) overlap,
    // C=[90,120)x[90,120) pokes out of the zone, D far away (other zone)
    val feats = Seq(
      (10L, 10L, 20L, 30L), (15L, 20L, 40L, 50L),
      (90L, 90L, 120L, 120L), (500L, 500L, 510L, 510L))
      .toDF("xlo", "ylo", "xhi", "yhi")
    val zones = Seq(("z0", 0L, 0L, 100L, 100L), ("z1", 400L, 400L, 600L, 600L))
    val got = SpatialJoin.unionAreaJoin(spark, feats, col("xlo"), col("ylo"),
        col("xhi"), col("yhi"), zones, cellSize = 64L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // A = 200, B = 750, overlap = [15,20)x[20,30) = 50 -> A∪B = 900;
    // C clipped = [90,100)x[90,100) = 100
    assert(got === Map("z0" -> 1000L, "z1" -> 100L))
  }

  test("random rects match exact rasterization; cellSize does not change the answer") {
    val rnd = new scala.util.Random(77)
    val feats = (1 to 120).map { _ =>
      val x = rnd.nextInt(90).toLong; val y = rnd.nextInt(90).toLong
      (x, y, x + 1 + rnd.nextInt(25), y + 1 + rnd.nextInt(25))
    }
    val zones = Seq(("za", 0L, 0L, 60L, 110L), ("zb", 60L, 0L, 115L, 110L))
    val df = feats.toDF("xlo", "ylo", "xhi", "yhi")
    val expect = zones.map { case (id, a, b, c, d) =>
      id -> raster(feats, (a, b, c, d))
    }.toMap
    for (cs <- Seq(7L, 16L, 1000L)) {
      val got = SpatialJoin.unionAreaJoin(spark, df, col("xlo"), col("ylo"),
          col("xhi"), col("yhi"), zones, cellSize = cs)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect, s"cellSize=$cs")
    }
  }

  test("sweep kernel: empty, nested, touching (half-open) rects") {
    assert(SpatialJoin.sweepUnionArea(Array.empty) === 0L)
    // nested: inner adds nothing
    assert(SpatialJoin.sweepUnionArea(Array((0L, 0L, 10L, 10L), (2L, 2L, 5L, 5L))) === 100L)
    // touching edges: no overlap, no gap
    assert(SpatialJoin.sweepUnionArea(Array((0L, 0L, 5L, 10L), (5L, 0L, 10L, 10L))) === 100L)
    assert(SpatialJoin.sweepUnionArea(Array((0L, 0L, 10L, 5L), (0L, 5L, 10L, 10L))) === 100L)
  }
}
