package graft.core

/** phash ↔ location codec (FIXTURES.md §1).
  *
  * The input table is locked to exactly
  * `(image_id, bytes, w, h, fmt, caption, phash)` (BASELINE.json input_hint)
  * — no lon/lat columns. Every row's location therefore derives
  * deterministically from `phash`: the 64-bit value is the Morton
  * interleave of the quantized (lon + 180°, lat + 90°) micro-degree
  * offsets (lon on even bits, lat on odd). Decode is exact; encode∘decode
  * is the identity on the valid coordinate range.
  *
  * The same phash is simultaneously a genuine 8×8 average-hash of the
  * image pixels (the fixture generator constructs pixels FROM the phash),
  * so both semantics are verifiable (FIXTURES.md §5.4).
  */
object PhashLoc {
  import FixedPoint._

  def encode(lonMicro: Long, latMicro: Long): Long =
    Morton.encode(lonMicro - LON_MIN, latMicro - LAT_MIN)

  @inline def lonMicro(phash: Long): Long = Morton.decodeX(phash) + LON_MIN
  @inline def latMicro(phash: Long): Long = Morton.decodeY(phash) + LAT_MIN
}

/** Geodesic-approximation metrics on micro-degree geometry — mirrors the
  * reference's fast area/length [ref: oshdb-util/…/geometry/Geo.java ::
  * areaOf, lengthOf]: equirectangular approximation scaled by cos(lat),
  * adequate for filter predicates `area:(..)` / `length:(..)`, not survey-
  * grade. Doubles are fine here: metrics are outputs, never join predicates.
  */
object GeoMetrics {
  val EARTH_RADIUS_M = 6378137.0
  private val M_PER_DEG = EARTH_RADIUS_M * math.Pi / 180.0

  /** Planar shoelace area of one ring in m² (positive regardless of winding). */
  def ringAreaM2(r: RingM): Double = {
    val n = r.xs.length
    var sum = 0.0
    var midLat = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      sum += (r.xs(i).toDouble * r.ys(j) - r.xs(j).toDouble * r.ys(i)) / 1e12
      midLat += r.ys(i).toDouble / 1e6
      i += 1
    }
    val latScale = math.cos(math.toRadians(midLat / n))
    math.abs(sum) / 2.0 * M_PER_DEG * M_PER_DEG * latScale
  }

  def areaM2(p: PolyM): Double = {
    var a = ringAreaM2(p.rings(0))
    var i = 1
    while (i < p.rings.length) { a -= ringAreaM2(p.rings(i)); i += 1 }
    a
  }

  def lengthM(r: RingM, closed: Boolean = true): Double = {
    val n = r.xs.length
    var sum = 0.0
    val last = if (closed) n else n - 1
    var i = 0
    while (i < last) {
      val j = (i + 1) % n
      val dx = (r.xs(j) - r.xs(i)).toDouble / 1e6
      val dy = (r.ys(j) - r.ys(i)).toDouble / 1e6
      val latScale = math.cos(math.toRadians((r.ys(j) + r.ys(i)).toDouble / 2e6))
      sum += math.sqrt(dx * dx * latScale * latScale + dy * dy) * M_PER_DEG
      i += 1
    }
    sum
  }
}
