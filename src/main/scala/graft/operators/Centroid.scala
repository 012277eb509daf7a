package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Polygon centroid / label point from the vertex-table form — the
  * rendering and labeling primitive ("one anchor point per district").
  * Upstream exposes this through JTS `Geometry.getCentroid` on assembled
  * geometries [ref: oshdb-util/…/geometry]; here it is ONE window pass +
  * ONE aggregate over the vertex table, no geometry objects built.
  *
  * Semantics (exact, engine-invariant): per polygon, vertices ordered by
  * `idx` form a closed ring (last pairs with first). With v0 = the
  * min-idx vertex and (dx, dy) = vertex − v0 (exact int64; translation
  * leaves a centroid invariant but keeps every product in range):
  *   cross_i = dx_i · dy_{i+1} − dx_{i+1} · dy_i          (int64)
  *   a2      = Σ cross_i                   (twice the signed ring area)
  *   cx6a    = Σ (dx_i + dx_{i+1}) · cross_i       (6 · a2 · centroid_x)
  * and the label point is the floor-quantized fixed IEEE chain
  *   cx_q = ⌊ double(x0) + double(cx6a) / double(3 · a2) ⌋
  * — one correctly-rounded division and one add, so any engine reproduces
  * the integer bit-for-bit (the q74 discipline). Rings with a2 = 0
  * (degenerate/zero-area) are dropped: their centroid is undefined and
  * NaN/Inf floor behavior is engine-specific. Self-intersecting rings get
  * the algebraic (signed-area-weighted) centroid — for simple rings this
  * IS the centroid; either way the rule is deterministic.
  *
  * Overflow contract (ANSI mode enforces it): with ring extent E =
  * max|vertex − v0| and n vertices, |cx6a| ≤ 4nE³ — keep 4nE³ < 2^63
  * (E ≤ ~600 km in µdeg at n = 8; split larger rings upstream).
  *
  * Plan (100 TB posture): ONE hash exchange on the polygon key serves the
  * ordering window (lead + first_value) AND the final per-polygon
  * aggregate — the aggregate key equals the window partitioning, so
  * Catalyst plans no second exchange. The per-ring sort is task-local;
  * nothing driver-sized.
  */
object Centroid {

  /** @return (poly_id, a2, cx_q, cy_q) — a2 the exact int64 twice-signed
    *         area, (cx_q, cy_q) the floor-quantized centroid, one row per
    *         ring with a2 ≠ 0
    */
  def labelPoints(verts: DataFrame, pid: Column, idx: Column,
                  x: Column, y: Column): DataFrame = {
    val w = Window.partitionBy(col("_pid")).orderBy(col("_idx"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val base = verts.select(pid.cast("long").as("_pid"),
      idx.cast("long").as("_idx"), x.cast("long").as("_x"),
      y.cast("long").as("_y"))

    base
      .withColumn("_x0", first(col("_x")).over(wAll))
      .withColumn("_y0", first(col("_y")).over(wAll))
      // ring closure: the last vertex pairs with the first
      .withColumn("_xn", coalesce(lead(col("_x"), 1).over(w), col("_x0")))
      .withColumn("_yn", coalesce(lead(col("_y"), 1).over(w), col("_y0")))
      .select(col("_pid"), col("_x0"), col("_y0"),
        (col("_x") - col("_x0")).as("_dx"), (col("_y") - col("_y0")).as("_dy"),
        (col("_xn") - col("_x0")).as("_dxn"), (col("_yn") - col("_y0")).as("_dyn"))
      .withColumn("_cross",
        col("_dx") * col("_dyn") - col("_dxn") * col("_dy"))
      .groupBy(col("_pid").as("poly_id"))
      .agg(
        sum(col("_cross")).as("a2"),
        sum((col("_dx") + col("_dxn")) * col("_cross")).as("_cx6a"),
        sum((col("_dy") + col("_dyn")) * col("_cross")).as("_cy6a"),
        first(col("_x0")).as("_fx0"), first(col("_y0")).as("_fy0"))
      .where(col("a2") =!= 0L)
      .select(col("poly_id"), col("a2"),
        floor(col("_fx0").cast("double") +
          col("_cx6a").cast("double") / (lit(3L) * col("a2")).cast("double"))
          .cast("long").as("cx_q"),
        floor(col("_fy0").cast("double") +
          col("_cy6a").cast("double") / (lit(3L) * col("a2")).cast("double"))
          .cast("long").as("cy_q"))
  }
}
