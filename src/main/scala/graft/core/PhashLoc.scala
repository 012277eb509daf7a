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

// Geo metrics live in GeoMetrics.scala (spherical-excess area + haversine
// length, replacing an earlier equirect approximation that lived here).
