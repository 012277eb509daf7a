package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Antimeridian (±180) seam handling: bbox splitting, cover superset, and
  * split-polygon membership parity vs the extended-coordinate raycast.
  */
class SeamSpec extends AnyFunSuite {

  test("splitBBox: crossing bbox becomes two in-world halves, union preserved") {
    val b = BBoxM(165000000L, -10000000L, -165000000L, 10000000L) // lonMin > lonMax
    val halves = Seam.splitBBox(b)
    assert(halves.size === 2)
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 2000) {
      val lon = rnd.nextLong(360000001L) - 180000000L
      val lat = rnd.nextLong(20000001L) - 10000000L
      val inSeam = (lon >= 165000000L || lon <= -165000000L)
      assert(halves.exists(_.contains(lon, lat)) === inSeam, s"($lon, $lat)")
    }
  }

  test("Seam.bboxCells covers every point of a crossing bbox") {
    val b = BBoxM(178000000L, 40000000L, -178500000L, 43000000L)
    val z = 7
    val cells = Seam.bboxCells(z, b).map { case (x, y) => Morton.encode(x, y) }.toSet
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 2000) {
      val lon = if (rnd.nextBoolean()) 178000000L + rnd.nextLong(2000000L)
        else -180000000L + rnd.nextLong(1500000L)
      val lat = 40000000L + rnd.nextLong(3000001L)
      assert(cells.contains(ZGrid.cellAt(z, lon, lat)), s"($lon, $lat)")
    }
  }

  test("splitAtSeam halves reproduce extended-polygon membership exactly") {
    // an irregular polygon authored across the seam: lon in [176e6, 184e6]
    val poly = graft.fixtures.Fixtures.irregular(180000000L, 20000000L, 4000000L, 14, 99L)
    val halves = Jts.splitAtSeam(Jts.toJtsEvenOdd(poly)).map(Jts.fromJtsAny)
    assert(halves.size === 2)
    for (h <- halves) {
      val b = h.bbox
      assert(b.lonMin >= -180000000L && b.lonMax <= 180000000L, "halves are in-world")
    }
    val rnd = new scala.util.Random(41)
    var inside = 0
    for (_ <- 0 until 4000) {
      // canonical in-world coordinates near the seam, both sides
      val lonC = rnd.nextLong(12000000L) + 174000000L // 174e6..186e6 extended
      val lon = if (lonC > 180000000L) lonC - 360000000L else lonC
      val lat = 14000000L + rnd.nextLong(12000001L)
      // truth: raycast on the EXTENDED polygon at the extended coordinate
      val ext = if (lon < 0) lon + 360000000L else lon
      val expect = Raycast.contains(ext, lat, poly)
      val got = halves.exists(h => Raycast.contains(lon, lat, h))
      assert(got === expect, s"($lon, $lat)")
      if (expect) inside += 1
    }
    assert(inside > 200, s"test must actually hit the polygon (hit $inside)")
    // cover of each half is a superset of that half's membership
    for (h <- halves) {
      val cover = PolyCover.coverAt(h, 8).map(_.morton).toSet
      for (_ <- 0 until 500) {
        val lon = rnd.nextLong(12000000L) + 174000000L
        val l = if (lon > 180000000L) lon - 360000000L else lon
        val lat = 14000000L + rnd.nextLong(12000001L)
        if (Raycast.contains(l, lat, h))
          assert(cover.contains(ZGrid.cellAt(8, l, lat)))
      }
    }
  }
}
