package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** H1 geometry construction: ring stitching, even-odd multipolygon
  * classification (vs JTS as the independent oracle), WKB ingest + repair.
  */
class RingAssemblySpec extends AnyFunSuite {

  private def rect(lo: Long, la: Long, hi: Long, ha: Long): RingM =
    RingM(Array(lo, hi, hi, lo), Array(la, la, ha, ha))

  test("assembleRings stitches shuffled, partially reversed ways into rings") {
    // square split into 3 ways, one reversed, plus a second square's 2 ways
    val ways = Seq(
      Array((0L, 0L), (10L, 0L), (10L, 10L)),
      Array((0L, 10L), (10L, 10L)), // reversed direction
      Array((0L, 10L), (0L, 0L)),
      Array((20L, 0L), (30L, 0L), (30L, 10L)),
      Array((30L, 10L), (20L, 10L), (20L, 0L)))
    val Right(rings) = RingAssembly.assembleRings(ways): @unchecked
    assert(rings.length === 2)
    assert(rings.map(_.xs.length).sorted.toSeq === Seq(4, 4))
  }

  test("unclosed ways: strict fails with the way index, lax drops them") {
    val ways = Seq(
      Array((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L), (0L, 0L)),
      Array((50L, 50L), (60L, 50L))) // dangling
    assert(RingAssembly.assembleRings(ways, strict = true).isLeft)
    val Right(rings) = RingAssembly.assembleRings(ways, strict = false): @unchecked
    assert(rings.length === 1)
  }

  test("even-odd classification vs JTS: shell+hole+island, island-in-hole") {
    // shell 0..100, hole 20..80, island-in-hole 40..60, disjoint shell 200..
    val p = PolyM(Array(
      rect(0, 0, 100, 100), rect(20, 20, 80, 80),
      rect(40, 40, 60, 60), rect(200, 0, 250, 50)))
    val g = Jts.toJtsEvenOdd(p)
    assert(g.isValid)
    assert(g.getGeometryType === "MultiPolygon")
    assert(g.getNumGeometries === 3) // outer shell, island, disjoint shell
    // containment agrees with the integer raycast for interior points
    val probes = Seq((10L, 10L, true), (50L, 50L, true), (30L, 30L, false),
      (220L, 20L, true), (150L, 50L, false), (70L, 25L, false), (15L, 25L, true))
    for ((x, y, expect) <- probes) {
      assert(Raycast.contains(x, y, p) === expect, s"raycast ($x,$y)")
      val pt = Jts.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x.toDouble, y.toDouble))
      assert(g.covers(pt) === expect, s"jts ($x,$y)")
    }
  }

  test("raycast == JTS on random probes over a 4-ring even-odd multipolygon") {
    val p = PolyM(Array(
      rect(0, 0, 1000, 1000), rect(100, 100, 900, 900),
      rect(300, 300, 700, 700), rect(2000, 0, 3000, 800)))
    val g = Jts.toJtsEvenOdd(p)
    val prep = Jts.prepare(g)
    val rnd = new scala.util.Random(4242)
    var checked = 0
    for (_ <- 0 until 2000) {
      val x = rnd.nextLong(3500) - 200; val y = rnd.nextLong(1400) - 200
      val rc = Raycast.classify(x, y, p)
      if (rc != 2) { // off-boundary: double and int kernels must agree
        val pt = Jts.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x.toDouble, y.toDouble))
        assert(prep.covers(pt) === (rc == 1), s"($x,$y)")
        checked += 1
      }
    }
    assert(checked > 1500)
  }

  test("WKB roundtrip: MultiPolygon in, even-odd PolyM out, semantics kept") {
    val p = PolyM(Array(rect(0, 0, 100, 100), rect(20, 20, 80, 80), rect(200, 0, 250, 50)))
    val wkb = Jts.toWkb(Jts.toJtsEvenOdd(p))
    val Right(back) = RingAssembly.fromWkb(wkb): @unchecked
    assert(back.rings.length === 3)
    for ((x, y) <- Seq((10L, 10L), (50L, 50L), (220L, 20L), (150L, 50L)))
      assert(Raycast.contains(x, y, back) === Raycast.contains(x, y, p), s"($x,$y)")
  }

  test("invalid WKB (bowtie) is rejected, then repaired with fix=true") {
    val bowtie = Jts.factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(0, 0),
      new org.locationtech.jts.geom.Coordinate(10, 10),
      new org.locationtech.jts.geom.Coordinate(10, 0),
      new org.locationtech.jts.geom.Coordinate(0, 10),
      new org.locationtech.jts.geom.Coordinate(0, 0)))
    val wkb = Jts.toWkb(bowtie)
    assert(RingAssembly.fromWkb(wkb).isLeft)
    val Right(fixed) = RingAssembly.fromWkb(wkb, fix = true): @unchecked
    assert(Jts.toJtsEvenOdd(fixed).isValid)
    assert(fixed.rings.length >= 2) // the bowtie splits into two triangles
  }

  test("random nested multipolygons: raycast == JTS, cover is a superset") {
    Det.forAll(40, 77) { r =>
      // up to 3 disjoint parent squares on a coarse grid, each optionally
      // with a hole, each hole optionally with an island — all nesting
      // depths 0/1/2 exercised with random sizes
      val rings = Seq.newBuilder[RingM]
      val nPar = 1 + r.nextInt(3)
      for (pi <- 0 until nPar) {
        val ox = pi * 4000000L
        val sz = 1000000L + r.nextInt(2000000)
        rings += rect(ox, 0, ox + sz, sz)
        if (r.nextBoolean()) {
          val m = sz / 4 + r.nextInt((sz / 8).toInt)
          rings += rect(ox + m, m, ox + sz - m, sz - m)
          if (r.nextBoolean() && sz - 2 * m > 400) {
            val k = (sz - 2 * m) / 3
            rings += rect(ox + m + k, m + k, ox + sz - m - k, sz - m - k)
          }
        }
      }
      val p = PolyM(rings.result().toArray)
      val g = Jts.toJtsEvenOdd(p)
      assert(g.isValid)
      val prep = Jts.prepare(g)
      val cover = PolyCover.cover(p)
      var agree = 0
      for (_ <- 0 until 200) {
        val x = r.nextLong(nPar * 4000000L + 1000000L) - 500000L
        val y = r.nextLong(4000000L) - 500000L
        val rc = Raycast.classify(x, y, p)
        if (rc != 2) {
          val pt = Jts.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x.toDouble, y.toDouble))
          assert(prep.covers(pt) === (rc == 1), s"($x,$y)")
          agree += 1
        }
        // cover superset: any contained point lies in an emitted cell
        if (rc != 0) {
          val z = cover.head.level
          val cell = ZGrid.cellAt(z, x, y)
          assert(cover.exists(_.morton == cell), s"cover miss ($x,$y) z=$z")
        }
      }
      assert(agree > 150)
    }
  }

  test("multiPolyFromWays: ways to validated multipolygon, cover works") {
    val ways = Seq(
      Array((0L, 0L), (100L, 0L), (100L, 100L)),
      Array((100L, 100L), (0L, 100L), (0L, 0L)),
      Array((20L, 20L), (80L, 20L), (80L, 80L), (20L, 80L), (20L, 20L)))
    val Right(p) = RingAssembly.multiPolyFromWays(ways): @unchecked
    assert(p.rings.length === 2)
    val cover = PolyCover.coverAt(p, 14)
    assert(cover.nonEmpty)
  }

  test("relationGeometry: closed ways -> polygon; open ways -> GeometryCollection (geometry:other)") {
    val closed = Seq(
      Array((0L, 0L), (100L, 0L), (100L, 100L)),
      Array((100L, 100L), (0L, 100L), (0L, 0L)))
    val g1 = RingAssembly.relationGeometry(closed)
    assert(Set("Polygon", "MultiPolygon").contains(g1.getGeometryType))
    // unclosed member ways degrade to the upstream GeometryCollection
    // fallback, vertices preserved way-by-way
    val open = Seq(
      Array((0L, 0L), (100L, 0L), (100L, 100L)),
      Array((500L, 500L), (600L, 500L)))
    val g2 = RingAssembly.relationGeometry(open)
    assert(g2.getGeometryType === "GeometryCollection")
    assert(g2.getNumGeometries === 2)
    assert(g2.getNumPoints === 5)
    assert((0 until 2).forall(i => g2.getGeometryN(i).getGeometryType === "LineString"))
    // WKB roundtrip keeps the collection (the table form q6h reads)
    val rt = Jts.fromWkb(Jts.toWkb(g2))
    assert(rt.getGeometryType === "GeometryCollection" && rt.getNumPoints === 5)
  }
}
