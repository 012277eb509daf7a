package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-feature convex hull + diameter — the feature-extent verb ("how far
  * apart are the two farthest points of this footprint"), used for label
  * sizing, generalization level selection, and outlier screening. Upstream
  * reaches it through JTS (`ConvexHull`, `MinimumDiameter`) on built
  * geometries; here it is one geometry-assembly hash aggregate and a
  * map-only exact-integer kernel over the vertex-table form.
  *
  * Semantics (pure int64, engine-invariant): per feature, the DIAMETER is
  * max over vertex pairs of dx² + dy² (squared planar micro-degrees — the
  * max of exact integers needs no quantization rule at all). The hull is
  * Andrew's monotone chain with exact int64 cross products (strict turns,
  * so collinear points never sit on the hull); it is a pure ACCELERATION —
  * the diameter is attained at hull vertices, so scanning hull pairs
  * (O(h²), h ≪ n) equals the brute O(n²) max the oracle computes.
  *
  * Overflow contract (ANSI-checked): coordinates within a feature must
  * span < ~2^31 µdeg (cross products are products of two spans).
  *
  * Plan (100 TB posture): ONE hash aggregate assembles each feature
  * (collect_list — the exchange every geometry builder pays), then the
  * kernel is map-only: no driver involvement, no joins, no second
  * exchange. A feature is by construction small enough to assemble — the
  * premise of every geometry operator here and upstream.
  */
object Hull {

  /** @return (poly_id, n_pts, d2) — vertex count and exact max pairwise
    *         squared distance (0 for single-vertex features)
    */
  def diameter(spark: SparkSession, verts: DataFrame, pid: Column,
               x: Column, y: Column): DataFrame = {
    import spark.implicits._
    verts.select(pid.cast("long").as("_pid"),
        x.cast("long").as("_x"), y.cast("long").as("_y"))
      .groupBy("_pid")
      .agg(collect_list(struct(col("_x"), col("_y"))).as("vs"))
      .as[(Long, Seq[(Long, Long)])]
      .map { case (pidV, vs) =>
        val hull = convexHull(vs.toArray)
        var best = 0L
        var i = 0
        while (i < hull.length) {
          var j = i + 1
          while (j < hull.length) {
            val dx = hull(j)._1 - hull(i)._1
            val dy = hull(j)._2 - hull(i)._2
            val d2 = dx * dx + dy * dy
            if (d2 > best) best = d2
            j += 1
          }
          i += 1
        }
        (pidV, vs.length.toLong, best)
      }
      .toDF("poly_id", "n_pts", "d2")
  }

  /** Andrew's monotone chain, exact int64. Strict turns: collinear points
    * are dropped, duplicates collapse in the sort; 1–2 distinct points
    * return as-is.
    */
  private[operators] def convexHull(pts: Array[(Long, Long)]): Array[(Long, Long)] = {
    val s = pts.distinct.sorted
    if (s.length <= 2) return s
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val buf = new Array[(Long, Long)](2 * s.length)
    var k = 0
    var i = 0
    while (i < s.length) { // lower hull
      while (k >= 2 && cross(buf(k - 2), buf(k - 1), s(i)) <= 0) k -= 1
      buf(k) = s(i); k += 1; i += 1
    }
    val lower = k + 1
    i = s.length - 2
    while (i >= 0) { // upper hull
      while (k >= lower && cross(buf(k - 2), buf(k - 1), s(i)) <= 0) k -= 1
      buf(k) = s(i); k += 1; i -= 1
    }
    buf.take(k - 1) // last point = first point
  }
}
