package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeoMetricsSpec extends AnyFunSuite {
  import GeoMetrics._
  private val M = FixedPoint.MICRO

  private def squareRing(lon0: Double, lat0: Double, d: Double): RingM = RingM(
    Array((lon0 * M).toLong, ((lon0 + d) * M).toLong, ((lon0 + d) * M).toLong, (lon0 * M).toLong),
    Array((lat0 * M).toLong, (lat0 * M).toLong, ((lat0 + d) * M).toLong, ((lat0 + d) * M).toLong))

  test("1-degree square at the equator matches the spherical-zone closed form") {
    val a = areaOf(PolyM(Array(squareRing(10, 0, 1))))
    val exact = EARTH_RADIUS_M * EARTH_RADIUS_M * math.toRadians(1) *
      (math.sin(math.toRadians(1)) - 0.0)
    assert(math.abs(a - exact) / exact < 1e-9)
    assert(a > 1.2e10 && a < 1.25e10) // ≈ (111.19 km)²·cos-weighted
  }

  test("area shrinks with latitude (cos factor)") {
    val eq = areaOf(PolyM(Array(squareRing(0, 0, 1))))
    val mid = areaOf(PolyM(Array(squareRing(0, 59.5, 1))))
    assert(mid / eq > 0.45 && mid / eq < 0.55) // cos(60°) = 0.5
  }

  test("holes subtract from the shell") {
    val shell = squareRing(0, 0, 1)
    val hole = squareRing(0.25, 0.25, 0.5)
    val full = areaOf(PolyM(Array(shell)))
    val holed = areaOf(PolyM(Array(shell, hole)))
    assert(math.abs(holed - full * (1 - 0.25)) / full < 0.01)
  }

  test("areaOfJts equals even-odd areaOf on polygons, holes, multipolygons") {
    // structured-JTS path (shell-minus-holes, no ring-nesting raycast) must
    // agree with the flattened even-odd path bit-for-bit on the same rings
    val shell = squareRing(0, 0, 2)
    val hole = squareRing(0.5, 0.5, 1)
    val island = squareRing(10, 10, 1)
    for (p <- Seq(
        PolyM(Array(shell)),
        PolyM(Array(shell, hole)),
        PolyM(Array(shell, hole, island)))) {
      val viaJts = areaOfJts(Jts.toJtsEvenOdd(p))
      assert(viaJts === areaOf(p), s"rings=${p.rings.length}")
    }
  }

  test("1-degree meridian arc is ~111.195 km; perimeter sums rings") {
    val d = haversine(0, 0, 0, (1 * M))
    assert(math.abs(d - 111194.93) < 10)
    val p = perimeterOf(PolyM(Array(squareRing(0, 0, 1))))
    assert(p > 4 * 110000 && p < 4 * 112000)
  }
}
