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
