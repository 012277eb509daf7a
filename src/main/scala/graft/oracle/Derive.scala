package graft.oracle

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{PolyM, RingM}
import graft.fixtures.PolySpec

/** Single source of truth for the driver-testdata spatial derivations:
  * every formula exists twice — as a Spark `Column` and as DuckDB SQL text —
  * generated from the SAME constants here, so oracle parity holds bit-exactly
  * (FIXTURES.md §4). All arithmetic is int64-safe under ANSI mode
  * (keys ≤ ~1e8, multipliers ≤ 2.7e9 ⇒ products ≤ ~2.7e17).
  */
object Derive {
  val LON_MUL = 2654435761L // Knuth multiplicative-hash constants
  val LAT_MUL = 2246822519L

  /** key → micro-degree longitude in [-170e6, 170e6). */
  def lonMicro(key: Column): Column = (key * LON_MUL) % 340000000L - 170000000L
  def latMicro(key: Column): Column = (key * LAT_MUL) % 160000000L - 80000000L
  def lonSql(key: String): String = s"(($key * $LON_MUL) % 340000000 - 170000000)"
  def latSql(key: String): String = s"(($key * $LAT_MUL) % 160000000 - 80000000)"
  /** Literal twins (key ≥ 0 so %-sign semantics can't diverge). */
  def lonMicroL(key: Long): Long = (key * LON_MUL) % 340000000L - 170000000L
  def latMicroL(key: Long): Long = (key * LAT_MUL) % 160000000L - 80000000L

  /** Fixed world rectangles for oracle-expressible spatial joins: the engine
    * runs its REAL cover-join + raycast path on them, while the DuckDB twin
    * is a plain inclusive bbox test (for axis-aligned rectangles the
    * boundary-inclusive raycast IS the inclusive bbox test).
    */
  val rects: Array[(String, Long, Long, Long, Long)] = Array(
    ("r0", -150000000L, -60000000L, -120000000L, -30000000L),
    ("r1", -100000000L, -20000000L, -60000000L, 20000000L),
    ("r2", -40000000L, 30000000L, -10000000L, 60000000L),
    ("r3", 0L, -50000000L, 30000000L, -20000000L),
    ("r4", 40000000L, 0L, 80000000L, 40000000L),
    ("r5", 90000000L, -40000000L, 130000000L, 0L),
    ("r6", 140000000L, 20000000L, 165000000L, 55000000L),
    ("r7", -165000000L, 70000000L, -155000000L, 78000000L))

  def rectSpecs: Array[PolySpec] = rects.map { case (id, lo, la, hi, ha) =>
    PolySpec(id, "rect", PolyM(Array(RingM(Array(lo, hi, hi, lo), Array(la, la, ha, ha)))))
  }

  /** Seam-crossing rect, authored with EXTENDED longitude past +180 (the
    * natural form for a Fiji-style extent): lon [165e6, 195e6] ≡
    * [165..180] ∪ [−180..−165], lat [−30e6, 10e6]. The engine splits it at
    * the seam (SpatialJoin.normalizeSeam); the oracle is the OR of the two
    * in-world lon ranges. Derived fixture lons stay inside ±170e6, so no
    * point sits exactly on the ±180 boundary.
    */
  val seamRect: (Long, Long, Long, Long) = (165000000L, -30000000L, 195000000L, 10000000L)

  def seamSpecs: Array[PolySpec] = {
    val (lo, la, hi, ha) = seamRect
    Array(PolySpec("s0", "seam",
      PolyM(Array(RingM(Array(lo, hi, hi, lo), Array(la, la, ha, ha))))))
  }

  /** MultiPolygon-with-hole fixtures (H1): each id is shell rect A with a
    * rectangular hole H strictly inside it, PLUS a disjoint shell rect B —
    * one even-odd PolyM of 3 rings. The engine runs the generic multi-shell
    * cover + raycast path; the DuckDB twin is pure rect algebra (exact,
    * boundary rule preserved: a point ON the hole boundary is INSIDE —
    * raycast's edge rule — so only the hole's strict interior excludes).
    */
  val multis: Array[(String, (Long, Long, Long, Long), (Long, Long, Long, Long), (Long, Long, Long, Long))] = Array(
    ("m0", (-150000000L, -60000000L, -110000000L, -25000000L),
           (-140000000L, -50000000L, -125000000L, -35000000L),
           (-90000000L, -60000000L, -70000000L, -40000000L)),
    ("m1", (-50000000L, 10000000L, -10000000L, 50000000L),
           (-40000000L, 20000000L, -25000000L, 40000000L),
           (10000000L, 10000000L, 30000000L, 35000000L)),
    ("m2", (50000000L, -45000000L, 100000000L, -5000000L),
           (60000000L, -35000000L, 80000000L, -15000000L),
           (110000000L, -45000000L, 140000000L, -20000000L)),
    ("m3", (120000000L, 30000000L, 160000000L, 65000000L),
           (130000000L, 40000000L, 150000000L, 55000000L),
           (-165000000L, 30000000L, -145000000L, 55000000L)))

  private def rectRing(r: (Long, Long, Long, Long)): RingM = {
    val (lo, la, hi, ha) = r
    RingM(Array(lo, hi, hi, lo), Array(la, la, ha, ha))
  }

  def multiSpecs: Array[PolySpec] = multis.map { case (id, shell, hole, island) =>
    PolySpec(id, "multi", PolyM(Array(rectRing(shell), rectRing(hole), rectRing(island))))
  }

  /** OPEN relations (H1 fallback arm): member ways that do NOT close into
    * rings, so geometry construction degrades to a GeometryCollection of
    * the member LineStrings — upstream's behavior for non-multipolygon
    * relations [ref: oshdb-util/…/OSHDBGeometryBuilder] and the
    * `geometry:other` class in the filter DSL. Deterministic micro-degree
    * coordinates; total vertex count per id is a generator-rule constant
    * the oracle recomputes (q6h).
    */
  val openRels: Array[(String, Array[Array[(Long, Long)]])] = Array(
    ("o0", Array(
      Array((10000000L, 10000000L), (12000000L, 10000000L), (12000000L, 12000000L)),
      Array((13000000L, 13000000L), (15000000L, 13000000L)))),
    ("o1", Array(
      Array((-30000000L, 5000000L), (-28000000L, 6000000L),
        (-26000000L, 5500000L), (-24000000L, 7000000L)))),
    ("o2", Array(
      Array((60000000L, -20000000L), (61000000L, -21000000L)),
      Array((62000000L, -22000000L), (63000000L, -23000000L)),
      Array((64000000L, -24000000L), (65000000L, -25000000L), (66000000L, -26000000L)))))

  /** DuckDB VALUES list matching [[multis]] (12 bounds per id). */
  def multisSqlValues: String = multis.map { case (id, a, h, b) =>
    s"('$id', ${a._1}, ${a._2}, ${a._3}, ${a._4}, ${h._1}, ${h._2}, ${h._3}, ${h._4}, " +
      s"${b._1}, ${b._2}, ${b._3}, ${b._4})"
  }.mkString("(VALUES ", ", ", ") AS m(poly_id, a_lo, a_la, a_hi, a_ha, " +
    "h_lo, h_la, h_hi, h_ha, b_lo, b_la, b_hi, b_ha)")

  /** Spherical-shoelace area of an axis-aligned rect (mirrors
    * GeoMetrics.ringArea, closed form: R²·Δλ·(sin φ_hi − sin φ_la)) and its
    * haversine perimeter, as DuckDB SQL over micro-degree bound columns.
    */
  val EarthR = "6371008.8"
  def rectAreaSql(lo: String, la: String, hi: String, ha: String): String =
    s"($EarthR * $EarthR * radians(($hi - $lo) / 1000000.0) * " +
      s"(sin(radians($ha / 1000000.0)) - sin(radians($la / 1000000.0))))"
  def rectPerimeterSql(lo: String, la: String, hi: String, ha: String): String =
    s"(2 * $EarthR * radians(($ha - $la) / 1000000.0) " +
      s"+ 2 * $EarthR * asin(cos(radians($la / 1000000.0)) * sin(radians(($hi - $lo) / 1000000.0) / 2)) " +
      s"+ 2 * $EarthR * asin(cos(radians($ha / 1000000.0)) * sin(radians(($hi - $lo) / 1000000.0) / 2)))"

  /** DuckDB VALUES list matching [[rects]]. */
  def rectsSqlValues: String = rects.map { case (id, lo, la, hi, ha) =>
    s"('$id', $lo, $la, $hi, $ha)"
  }.mkString("(VALUES ", ", ", ") AS r(poly_id, lon_min, lat_min, lon_max, lat_max)")

  /** DuckDB SQL computing the level-z Morton zcell of (lonm, latm) columns,
    * via WITH-chained spread-bits — mirrors graft.core.{ZGrid, Morton} for
    * z ≤ 16 exactly (no clamp needed: derived coords stay inside the world).
    */
  def zcellSqlCte(z: Int): String = {
    require(z <= 16)
    val n = 1L << z
    s"""xy AS (SELECT ((lonm + 180000000) * $n) // 360000000 AS x,
       |             ((latm + 90000000) * $n) // 180000000 AS y, * FROM pts),
       |s1 AS (SELECT ((x | (x << 8)) & 16711935) AS x, ((y | (y << 8)) & 16711935) AS y, * EXCLUDE (x, y) FROM xy),
       |s2 AS (SELECT ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y, * EXCLUDE (x, y) FROM s1),
       |s3 AS (SELECT ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y, * EXCLUDE (x, y) FROM s2),
       |s4 AS (SELECT ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y, * EXCLUDE (x, y) FROM s3),
       |zc AS (SELECT x + 2 * y AS cell, * EXCLUDE (x, y) FROM s4)""".stripMargin
  }
}
