package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{BBoxM, Morton, ZGrid}

/** Map matching — snap each point to its NEAREST segment within a radius
  * (the "attach GPS fix / photo location to the road network" verb; upstream
  * users compose OSHDB's cell index with a nearest-way scan for this, we make
  * it one operator).
  *
  * Semantics: for every point p, among all segments s with
  * point-to-segment distance d(p, s) ≤ radius, return the one minimizing
  * (⌊d²⌋, segment_id) — the floor-quantized squared planar micro-degree
  * distance with the id as the deterministic tie-break. Points with no
  * segment inside the radius are absent from the output (standard max-snap
  * map matching). Output also carries the snapped position — the closest
  * point ON the chosen segment — floor-quantized to micro-degrees.
  *
  * Exactness / oracle parity: the per-pair kernel is a FIXED IEEE double
  * chain (the q74 trick): long differences (exact) cast to double (exact,
  * diffs < 2^53), then dot = wx·dx + wy·dy, len² = dx² + dy²,
  * t = clamp(dot/len², 0, 1) (0 for degenerate zero-length segments),
  * e = w − t·d, d² = ex² + ey². Every operation is a correctly-rounded IEEE
  * double op evaluated in the same order by any engine, so ⌊d²⌋ and the
  * ⌊snap⌋ coordinates are engine-invariant integers a DuckDB twin
  * reproduces bit-for-bit — no libm call anywhere in the chain.
  *
  * Plan (100 TB posture): NO broadcast — both sides are table-sized.
  *   1. segments explode to the cover cells of their bbox EXPANDED by the
  *      radius at `level` (fan-out bounded by (len/cell + 2r/cell + 2)²;
  *      pick cell ≈ radius); points compute their ONE cell — so each
  *      candidate pair appears exactly once and needs no dedup;
  *   2. one equi-join on the cell (shuffle ∝ candidates, AQE-skew-safe —
  *      no all-pairs stage anywhere);
  *   3. the codegen double kernel filters to d² ≤ r² and ONE
  *      ObjectHashAggregate takes the lexicographic argmin per point via
  *      [[graft.functions.ArgMinLongsAgg]] — map-side partial argmin in a
  *      hash table (min(struct) would plan as SortAggregate and sort the
  *      candidate set on both exchange sides), so the second exchange
  *      carries ≤ one row per (task, point) and the plan has NO sort node.
  * Containment proof: d(p, s) ≤ r ⇒ p lies in s's r-expanded bbox ⇒ p's
  * cell (same level, same clamped grid) is among that bbox's cover cells.
  */
object MapMatch {

  /** @param points (pId, pLon, pLat) micro-degree point table
    * @param segs   (sId, x1, y1, x2, y2) micro-degree segment table
    * @param radiusMicro max snap distance (planar micro-degrees)
    * @param level  ZGrid level for the candidate cell join (cell ≈ radius)
    * @return (qid, seg_id, snap_d2q, snap_x, snap_y) — one row per matched
    *         point: ⌊d²⌋ and the ⌊·⌋-quantized closest point on the segment
    */
  def snapToSegments(spark: SparkSession, points: DataFrame,
                     pId: Column, pLon: Column, pLat: Column,
                     segs: DataFrame, sId: Column,
                     x1: Column, y1: Column, x2: Column, y2: Column,
                     radiusMicro: Long, level: Int): DataFrame = {
    require(radiusMicro > 0, "radiusMicro must be positive")
    require(level >= 1 && level <= 16, "level must be in [1, 16]")
    import spark.implicits._

    val pts = points.select(pId.cast("long").as("qid"),
        pLon.cast("long").as("_plon"), pLat.cast("long").as("_plat"))
      .withColumn("_cell",
        graft.functions.GraftFunctions.zcell(col("_plon"), col("_plat"), level))

    val prepared = segs.select(sId.cast("long").as("_sid"),
      x1.cast("long").as("_x1"), y1.cast("long").as("_y1"),
      x2.cast("long").as("_x2"), y2.cast("long").as("_y2"))
    val r = radiusMicro
    val exploded = prepared.flatMap { row =>
      val (sx1, sy1, sx2, sy2) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      val b = BBoxM(math.min(sx1, sx2) - r, math.min(sy1, sy2) - r,
        math.max(sx1, sx2) + r, math.max(sy1, sy2) + r)
      ZGrid.bboxCells(level, b).map { case (cx, cy) =>
        (row.getLong(0), sx1, sy1, sx2, sy2, Morton.encode(cx, cy))
      }
    }.toDF("_sid", "_x1", "_y1", "_x2", "_y2", "_cell")

    val joined = pts.join(exploded, Seq("_cell"))

    // fixed IEEE chain — identical op order to the DuckDB twin
    val wx = (col("_plon") - col("_x1")).cast("double")
    val wy = (col("_plat") - col("_y1")).cast("double")
    val dx = (col("_x2") - col("_x1")).cast("double")
    val dy = (col("_y2") - col("_y1")).cast("double")
    val dot = wx * dx + wy * dy
    val len2 = dx * dx + dy * dy
    val t = when(len2 === 0.0, lit(0.0))
      .otherwise(least(greatest(dot / len2, lit(0.0)), lit(1.0)))
    val ex = wx - t * dx
    val ey = wy - t * dy
    val d2 = ex * ex + ey * ey

    joined
      .withColumn("_d2q", floor(d2).cast("long"))
      .withColumn("_snapx", floor(col("_x1").cast("double") + t * dx).cast("long"))
      .withColumn("_snapy", floor(col("_y1").cast("double") + t * dy).cast("long"))
      .where(col("_d2q") <= lit(r * r))
      .groupBy("qid")
      .agg(graft.functions.ArgMinLongsAgg.argminLongs(
        struct(col("_d2q"), col("_sid"), col("_snapx"), col("_snapy"))).as("_best"))
      .select(col("qid"), col("_best._sid").as("seg_id"),
        col("_best._d2q").as("snap_d2q"),
        col("_best._snapx").as("snap_x"), col("_best._snapy").as("snap_y"))
  }
}
