package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{BBoxM, Morton, ZGrid}

/** Segment-intersection join — all pairs (a, b) of segments from two tables
  * that share at least one point (the "where do roads cross rivers /
  * railways / other roads" verb; upstream users compose OSHDB's cell index
  * with JTS `intersects` over way geometries for this, we make the segment
  * case one exact operator).
  *
  * Exactness: the predicate is the classic 4-orientation test evaluated in
  * PURE int64 — cross(p, q, r) = (qx−px)·(ry−py) − (qy−py)·(rx−px) with
  * micro-degree coordinates (diffs < 2^30, products < 2^60: exact, no
  * overflow under ANSI) — so intersect/touch/collossal-overlap decisions
  * carry NO float anywhere:
  *   - proper crossing: the endpoints of each segment lie strictly on
  *     opposite sides of the other (sign(d1)·sign(d2) < 0 on both);
  *   - touching / collinear overlap: some endpoint is collinear with and
  *     inside the other segment's bbox (covers T-touch, shared endpoints,
  *     and 1-D overlap — overlapping collinear segments always contain at
  *     least one endpoint of the other).
  * For PROPER crossings the crossing point is also returned, floor-quantized
  * to micro-degrees via a fixed IEEE chain (the q74 trick): exact int64
  * numerator/denominator casts to double (correctly rounded in any engine),
  * one division, one fma-free multiply-add sequence, floor — so (ix, iy) is
  * an engine-invariant integer a DuckDB twin reproduces bit-for-bit. Touch
  * rows report (0, 0) — the touch point set may be a whole interval.
  *
  * Plan (100 TB posture): NO broadcast, NO all-pairs, NO pair-dedup
  * exchange. Both sides explode to the cover cells of their segment bbox at
  * `level`; one equi-join on the cell; a pair that meets in several shared
  * cells is kept ONLY in the canonical cell containing the lower-left
  * corner of the two bboxes' intersection (the Dittrich–Seeger
  * reference-point method) — a per-row filter computed from the joined
  * coordinates, so each intersecting pair is produced EXACTLY once with
  * zero extra shuffles. Containment proof: segments intersecting ⇒ bboxes
  * overlap ⇒ the corner (max of lon-mins, max of lat-mins) lies in BOTH
  * bboxes ⇒ its cell is in both cover sets.
  */
object LineIntersect {

  /** @param a (aId, ax1, ay1, ax2, ay2) micro-degree segment table
    * @param b (bId, bx1, by1, bx2, by2) micro-degree segment table
    * @param level ZGrid level for the candidate cell join (cell ≈ typical
    *              segment extent; fan-out per segment is bounded by
    *              (len/cell + 2)²)
    * @return (a_id, b_id, proper, ix, iy) — one row per intersecting pair;
    *         (ix, iy) = ⌊crossing point⌋ for proper crossings, (0, 0) for
    *         touch/collinear rows
    */
  def intersectJoin(spark: SparkSession, a: DataFrame,
                    aId: Column, ax1: Column, ay1: Column, ax2: Column, ay2: Column,
                    b: DataFrame,
                    bId: Column, bx1: Column, by1: Column, bx2: Column, by2: Column,
                    level: Int): DataFrame = {
    require(level >= 1 && level <= 16, "level must be in [1, 16]")
    import spark.implicits._

    def exploded(df: DataFrame, id: Column, x1: Column, y1: Column,
                 x2: Column, y2: Column, p: String): DataFrame =
      df.select(id.cast("long").as(s"${p}_id"),
          x1.cast("long").as(s"_${p}x1"), y1.cast("long").as(s"_${p}y1"),
          x2.cast("long").as(s"_${p}x2"), y2.cast("long").as(s"_${p}y2"))
        .flatMap { row =>
          val (sx1, sy1, sx2, sy2) =
            (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
          val bb = BBoxM(math.min(sx1, sx2), math.min(sy1, sy2),
            math.max(sx1, sx2), math.max(sy1, sy2))
          ZGrid.bboxCells(level, bb).map { case (cx, cy) =>
            (row.getLong(0), sx1, sy1, sx2, sy2, Morton.encode(cx, cy))
          }
        }.toDF(s"${p}_id", s"_${p}x1", s"_${p}y1", s"_${p}x2", s"_${p}y2", "_cell")

    val ea = exploded(a, aId, ax1, ay1, ax2, ay2, "a")
    val eb = exploded(b, bId, bx1, by1, bx2, by2, "b")
    val joined = ea.join(eb, Seq("_cell"))

    // reference point: lower-left corner of the bbox intersection — keep
    // the pair only in ITS cell (exactly-once without a distinct exchange)
    val refX = greatest(least(col("_ax1"), col("_ax2")), least(col("_bx1"), col("_bx2")))
    val refY = greatest(least(col("_ay1"), col("_ay2")), least(col("_by1"), col("_by2")))
    val canonical = joined.where(col("_cell") ===
      graft.functions.GraftFunctions.zcell(refX, refY, level))

    // exact int64 orientations (sign in {-1, 0, 1} via CASE — mirrors the
    // DuckDB twin's CASE text exactly; no float)
    def sgn(c: Column): Column = when(c > 0, 1).when(c < 0, -1).otherwise(0)
    def cross(px: Column, py: Column, qx: Column, qy: Column,
              rx: Column, ry: Column): Column =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val d1 = sgn(cross(col("_ax1"), col("_ay1"), col("_ax2"), col("_ay2"), col("_bx1"), col("_by1")))
    val d2 = sgn(cross(col("_ax1"), col("_ay1"), col("_ax2"), col("_ay2"), col("_bx2"), col("_by2")))
    val d3 = sgn(cross(col("_bx1"), col("_by1"), col("_bx2"), col("_by2"), col("_ax1"), col("_ay1")))
    val d4 = sgn(cross(col("_bx1"), col("_by1"), col("_bx2"), col("_by2"), col("_ax2"), col("_ay2")))

    def onSeg(px: Column, py: Column, qx: Column, qy: Column,
              rx: Column, ry: Column): Column =
      rx.between(least(px, qx), greatest(px, qx)) &&
        ry.between(least(py, qy), greatest(py, qy))
    val proper = d1 * d2 < 0 && d3 * d4 < 0
    val touches =
      (d1 === 0 && onSeg(col("_ax1"), col("_ay1"), col("_ax2"), col("_ay2"), col("_bx1"), col("_by1"))) ||
      (d2 === 0 && onSeg(col("_ax1"), col("_ay1"), col("_ax2"), col("_ay2"), col("_bx2"), col("_by2"))) ||
      (d3 === 0 && onSeg(col("_bx1"), col("_by1"), col("_bx2"), col("_by2"), col("_ax1"), col("_ay1"))) ||
      (d4 === 0 && onSeg(col("_bx1"), col("_by1"), col("_bx2"), col("_by2"), col("_ax2"), col("_ay2")))

    // crossing point for proper rows — fixed IEEE chain, same op order as
    // the twin: t = (wx·sy − wy·sx) / (rx·sy − ry·sx), both int64-exact
    // before ONE correctly-rounded cast each; den ≠ 0 whenever proper.
    val numL = (col("_bx1") - col("_ax1")) * (col("_by2") - col("_by1")) -
      (col("_by1") - col("_ay1")) * (col("_bx2") - col("_bx1"))
    val denL = (col("_ax2") - col("_ax1")) * (col("_by2") - col("_by1")) -
      (col("_ay2") - col("_ay1")) * (col("_bx2") - col("_bx1"))
    val t = numL.cast("double") / denL.cast("double")
    val ix = floor(col("_ax1").cast("double") +
      t * (col("_ax2") - col("_ax1")).cast("double")).cast("long")
    val iy = floor(col("_ay1").cast("double") +
      t * (col("_ay2") - col("_ay1")).cast("double")).cast("long")

    canonical
      .withColumn("proper", proper)
      .where(col("proper") || touches)
      .select(col("a_id"), col("b_id"), col("proper"),
        when(col("proper"), ix).otherwise(0L).as("ix"),
        when(col("proper"), iy).otherwise(0L).as("iy"))
  }
}
