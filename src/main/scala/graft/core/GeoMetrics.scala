package graft.core

/** Geodesic-approximate area and length kernels (SURVEY.md H3/H4 —
  * [ref: oshdb-util/…/geometry/Geo.java :: areaOf / lengthOf]): fast
  * spherical approximations good to <0.5% at mid latitudes, matching the
  * reference's "fast approx, not ellipsoid-exact" contract. These feed the
  * filter DSL's geometry-metric stage (`area:(..)` / `length:(..)`), which
  * by construction runs AFTER geometry construction — the reference's
  * applyOSMGeometry ordering (SURVEY.md O2).
  */
object GeoMetrics {
  val EARTH_RADIUS_M: Double = 6371008.8 // mean radius

  @inline private def rad(micro: Long): Double =
    math.toRadians(micro.toDouble / FixedPoint.MICRO)

  /** Signed spherical ring area (m²): A = R²/2 · Σ (λ2−λ1)(sin φ1 + sin φ2). */
  def ringArea(r: RingM): Double = {
    val n = r.xs.length
    var sum = 0.0
    var i = 0
    var x1 = rad(r.xs(n - 1)); var y1 = rad(r.ys(n - 1))
    while (i < n) {
      val x2 = rad(r.xs(i)); val y2 = rad(r.ys(i))
      sum += (x2 - x1) * (math.sin(y1) + math.sin(y2))
      x1 = x2; y1 = y2
      i += 1
    }
    math.abs(sum) * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0
  }

  /** Polygonal area under PolyM's even-odd semantics: a ring at even
    * nesting depth (shell, island-in-hole, …) adds its area; odd depth
    * (hole) subtracts — correct for plain polygons-with-holes AND
    * multipolygons in one rule (Raycast.ringDepths).
    *
    * Cost note: ringDepths is O(rings² · vertices²) — fine for the flat
    * even-odd sets the filter path sees (few rings), but when the caller
    * already HOLDS a structured JTS geometry (shell/hole membership known),
    * use [[areaOfJts]] instead: same value, O(rings · vertices), no raycast.
    * The 1-ring case short-circuits here too.
    */
  def areaOf(p: PolyM): Double = {
    if (p.rings.length == 1) return ringArea(p.rings(0))
    val depths = Raycast.ringDepths(p.rings)
    var a = 0.0
    var i = 0
    while (i < p.rings.length) {
      a += (if (depths(i) % 2 == 0) ringArea(p.rings(i)) else -ringArea(p.rings(i)))
      i += 1
    }
    math.max(a, 0.0)
  }

  /** Area from an already-structured JTS Polygon/MultiPolygon: shells add,
    * holes subtract, members sum — no ring-nesting search (JTS encodes the
    * nesting; a MultiPolygon's island-in-hole is its own member Polygon).
    * Exactly the value [[areaOf]] computes on the flattened even-odd ring
    * set, at O(rings · vertices). The WKB metric path (withGeoMetrics) uses
    * this — the round-2 areaOf switch to ringDepths made that path
    * quadratic in rings·vertices for many-ring multipolygons.
    */
  def areaOfJts(g: org.locationtech.jts.geom.Geometry): Double = {
    def ringOf(ls: org.locationtech.jts.geom.LineString): RingM = {
      val cs = ls.getCoordinates
      val n = cs.length - 1 // drop closing duplicate; RingM wraps implicitly
      RingM(Array.tabulate(n)(i => Math.round(cs(i).x)), Array.tabulate(n)(i => Math.round(cs(i).y)))
    }
    g match {
      case p: org.locationtech.jts.geom.Polygon =>
        var a = ringArea(ringOf(p.getExteriorRing))
        var i = 0
        while (i < p.getNumInteriorRing) { a -= ringArea(ringOf(p.getInteriorRingN(i))); i += 1 }
        math.max(a, 0.0)
      case mp: org.locationtech.jts.geom.MultiPolygon =>
        var a = 0.0
        var i = 0
        while (i < mp.getNumGeometries) { a += areaOfJts(mp.getGeometryN(i)); i += 1 }
        a
      case other =>
        throw new IllegalArgumentException(s"not polygonal: ${other.getGeometryType}")
    }
  }

  /** Haversine great-circle distance (m) between two micro-degree points. */
  def haversine(lon1: Long, lat1: Long, lon2: Long, lat2: Long): Double = {
    val f1 = rad(lat1); val f2 = rad(lat2)
    val dF = f2 - f1; val dL = rad(lon2) - rad(lon1)
    val a = math.sin(dF / 2) * math.sin(dF / 2) +
      math.cos(f1) * math.cos(f2) * math.sin(dL / 2) * math.sin(dL / 2)
    2 * EARTH_RADIUS_M * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** OPEN polyline length (m) — haversine over consecutive vertices, no
    * implicit closing edge (the upstream `length` metric for linear
    * geometries [ref: oshdb-util/…/Geo.lengthOf]).
    */
  def lineLength(xs: Array[Long], ys: Array[Long]): Double = {
    var s = 0.0
    var i = 1
    while (i < xs.length) {
      s += haversine(xs(i - 1), ys(i - 1), xs(i), ys(i))
      i += 1
    }
    s
  }

  /** Ring perimeter (m) — closed implicitly like Raycast. */
  def ringLength(r: RingM): Double = {
    val n = r.xs.length
    var sum = 0.0
    var i = 0
    var px = r.xs(n - 1); var py = r.ys(n - 1)
    while (i < n) {
      sum += haversine(px, py, r.xs(i), r.ys(i))
      px = r.xs(i); py = r.ys(i)
      i += 1
    }
    sum
  }

  /** Polygon perimeter: shell + hole boundaries (reference perimeter
    * semantics [ref: oshdb-filter GeometryFilterPerimeter]).
    */
  def perimeterOf(p: PolyM): Double = p.rings.map(ringLength).sum
}
