package graft.core

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter}

/** JTS bridge: micro-degree fixed-point ↔ JTS doubles (exact — micro-degree
  * ints fit a double mantissa), WKB (the only form geometry takes on the
  * wire / in shuffles; JVM geometry objects never cross a stage boundary,
  * SURVEY.md §7 decision (e)).
  */
object Jts {
  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  def ringToJts(r: RingM): LinearRing = {
    val n = r.xs.length
    val closed = r.xs(0) == r.xs(n - 1) && r.ys(0) == r.ys(n - 1)
    val m = if (closed) n else n + 1
    val cs = new Array[Coordinate](m)
    var i = 0
    while (i < n) { cs(i) = new Coordinate(r.xs(i).toDouble, r.ys(i).toDouble); i += 1 }
    if (!closed) cs(n) = new Coordinate(r.xs(0).toDouble, r.ys(0).toDouble)
    factory.createLinearRing(cs)
  }

  def polyToJts(p: PolyM): Polygon = {
    val shell = ringToJts(p.rings(0))
    val holes = p.rings.drop(1).map(ringToJts)
    factory.createPolygon(shell, holes)
  }

  def jtsToPoly(g: Polygon): PolyM = {
    def ring(lr: LineString): RingM = {
      val cs = lr.getCoordinates
      // drop the closing duplicate vertex; RingM wraps implicitly
      val n = cs.length - 1
      RingM(Array.tabulate(n)(i => Math.round(cs(i).x)), Array.tabulate(n)(i => Math.round(cs(i).y)))
    }
    PolyM((ring(g.getExteriorRing) +: (0 until g.getNumInteriorRing).map(i => ring(g.getInteriorRingN(i)))).toArray)
  }

  def toWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)
  def fromWkb(b: Array[Byte]): Geometry = new WKBReader(factory).read(b)

  /** Even-odd PolyM (flat ring set, shells + holes + disjoint shells mixed)
    * → proper JTS Polygon/MultiPolygon. Ring parity by nesting depth of each
    * ring's strict INTERIOR point (robust to rings sharing boundary
    * vertices/edges): even depth = shell, odd = hole, a hole belongs to its
    * innermost containing shell. This is what lets PolyCover classify cover
    * cells for multipolygons — the raycast refine needs no conversion
    * (even-odd crossing counting handles multiple shells natively).
    */
  def toJtsEvenOdd(p: PolyM): Geometry = {
    val rings = p.rings
    if (rings.length == 1) return factory.createPolygon(ringToJts(rings(0)))
    val singles = rings.map(r => PolyM(Array(r)))
    // vertex-based test points + raycast depths (Raycast.ringDepths) — NOT
    // the ring-polygon's interiorPoint: a shell's interior point can land
    // inside its own hole.
    val testPt = Raycast.ringTestPoints(rings)
    val depth = Raycast.ringDepths(rings)
    val shells = rings.indices.filter(i => depth(i) % 2 == 0)
    val holes = rings.indices.filter(i => depth(i) % 2 == 1)
    val polys = shells.map { s =>
      // a hole's parent is the unique shell one level up that contains it
      val myHoles = holes.filter { h =>
        depth(h) == depth(s) + 1 &&
          Raycast.classify(testPt(h)._1, testPt(h)._2, singles(s)) == 1
      }
      factory.createPolygon(ringToJts(rings(s)), myHoles.map(h => ringToJts(rings(h))).toArray)
    }
    if (polys.length == 1) polys.head
    else factory.createMultiPolygon(polys.toArray)
  }

  /** Flatten a JTS Polygon/MultiPolygon into the even-odd [[PolyM]] form
    * (all rings of all member polygons, closing vertices dropped).
    */
  def fromJtsAny(g: Geometry): PolyM = g match {
    case p: Polygon => jtsToPoly(p)
    case mp: MultiPolygon =>
      val rings = (0 until mp.getNumGeometries).flatMap { i =>
        jtsToPoly(mp.getGeometryN(i).asInstanceOf[Polygon]).rings
      }
      PolyM(rings.toArray)
    case other =>
      throw new IllegalArgumentException(s"not polygonal: ${other.getGeometryType}")
  }

  def bboxToJts(b: BBoxM): Polygon = {
    val cs = Array(
      new Coordinate(b.lonMin.toDouble, b.latMin.toDouble),
      new Coordinate(b.lonMax.toDouble, b.latMin.toDouble),
      new Coordinate(b.lonMax.toDouble, b.latMax.toDouble),
      new Coordinate(b.lonMin.toDouble, b.latMax.toDouble),
      new Coordinate(b.lonMin.toDouble, b.latMin.toDouble))
    factory.createPolygon(cs)
  }

  def prepare(g: Geometry): PreparedGeometry = PreparedGeometryFactory.prepare(g)

  /** Split a geometry whose longitudes may extend past ±180e6 (the natural
    * authoring form for a seam-crossing polygon: Fiji as [178e6, 182e6])
    * into its in-world halves: the geometry itself and its ±360°-shifted
    * copies, each clipped to the world box, keeping areal parts only.
    * Each half is an ordinary polygon the cover/raycast path handles
    * unchanged; a point row has ONE canonical longitude, so it can match
    * at most one half — no duplicate join rows.
    */
  def splitAtSeam(g: Geometry): Seq[Geometry] = {
    val world = bboxToJts(BBoxM(-180000000L, -90000000L, 180000000L, 90000000L))
    val env = g.getEnvelopeInternal
    if (env.getMinX >= -180000000.0 && env.getMaxX <= 180000000.0) return Seq(g)
    def shifted(dx: Double): Geometry =
      org.locationtech.jts.geom.util.AffineTransformation
        .translationInstance(dx, 0).transform(g)
    Seq(g, shifted(-360000000.0), shifted(360000000.0))
      .map(_.intersection(world))
      .flatMap(polygonalParts)
  }

  /** Areal components of a geometry (drops clip-boundary lines/points). */
  private def polygonalParts(g: Geometry): Seq[Geometry] = g match {
    case p: Polygon if !p.isEmpty => Seq(p)
    case mp: MultiPolygon if !mp.isEmpty => Seq(mp)
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).flatMap(i => polygonalParts(gc.getGeometryN(i)))
    case _ => Seq.empty
  }
}

/** One cover cell of a polygon: morton id at `level`, and whether the cell
  * is FULLY covered by the polygon (points there skip the exact PIP refine —
  * the reference's fully-inside fast path
  * [ref: oshdb-util/…/geometry/fip/FastBboxInPolygon.java], SURVEY.md O3).
  */
final case class CoverCell(level: Int, morton: Long, full: Boolean)

/** Plan-time polygon → cover-cells computation (runs on the driver over the
  * polygon side only — the BIG side never does geometry work it can skip).
  *
  * Replaces the reference's query-time `bbox2CellIdRanges` pruning +
  * `GeometrySplitter` STRtree probe [ref: oshdb-api/…/mapreducer —
  * MapAggregator :: aggregateByGeometry] with a cover-cell equi-join:
  * polygons explode to (cell, poly_id, full); points compute one zcell;
  * the spatial join becomes a hash join Catalyst can broadcast or
  * sort-merge, with AQE handling skew.
  *
  * Level selection mirrors the reference's insertion-level trick (O8): each
  * polygon is covered at the FINEST level whose cover stays under
  * `cellBudget`, so large polygons get coarse cells (no cover explosion)
  * and small polygons get tight cells (high join selectivity).
  */
object PolyCover {
  val DEFAULT_BUDGET = 256
  val MIN_LEVEL = 2
  val MAX_LEVEL = 16

  def chooseLevel(bbox: BBoxM, cellBudget: Int = DEFAULT_BUDGET): Int = {
    var z = MAX_LEVEL
    while (z > MIN_LEVEL && ZGrid.bboxCellCount(z, bbox) > cellBudget) z -= 1
    z
  }

  /** Cover one polygon at its chosen level. Guarantees cover ⊇ polygon:
    * every point with Raycast.contains == true lies in some emitted cell
    * (cells are classified with JTS `intersects`/`covers` on the exact
    * double lift of the same integer coordinates).
    */
  def cover(poly: PolyM, cellBudget: Int = DEFAULT_BUDGET): Array[CoverCell] = {
    val z = chooseLevel(poly.bbox, cellBudget)
    coverAt(poly, z)
  }

  def coverAt(poly: PolyM, z: Int): Array[CoverCell] = {
    // even-odd conversion: handles single polygons, holes, AND disjoint
    // multi-shell sets in one path (H1/MultiPolygon support)
    val jts = Jts.toJtsEvenOdd(poly)
    val prep = Jts.prepare(jts)
    val out = Array.newBuilder[CoverCell]
    ZGrid.bboxCells(z, poly.bbox).foreach { case (x, y) =>
      val cb = Jts.bboxToJts(ZGrid.cellBBox(z, x, y))
      if (prep.covers(cb)) out += CoverCell(z, Morton.encode(x, y), full = true)
      else if (prep.intersects(cb)) out += CoverCell(z, Morton.encode(x, y), full = false)
    }
    out.result()
  }

  /** Cover at a FIXED level for all polygons, as compact morton ranges:
    * contiguous runs of sibling FULL cells collapse into [lo, hi] ranges
    * (z-order ⇒ a full parent = one contiguous child range). Used by the
    * range-join variant at scale where per-polygon levels don't fit an
    * equi-join. Returned ranges are inclusive.
    */
  def coverRanges(poly: PolyM, z: Int): Array[(Long, Long, Boolean)] = {
    val cells = coverAt(poly, z).sortBy(_.morton)
    val out = Array.newBuilder[(Long, Long, Boolean)]
    var i = 0
    while (i < cells.length) {
      var j = i
      while (j + 1 < cells.length && cells(j + 1).morton == cells(j).morton + 1 &&
             cells(j + 1).full == cells(i).full) j += 1
      out += ((cells(i).morton, cells(j).morton, cells(i).full))
      i = j + 1
    }
    out.result()
  }
}
