package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Polyline simplification — Douglas–Peucker (1973), the canonical
  * cartographic generalization verb ("render the way at zoom 8 with 1/20th
  * of the vertices"); upstream users run JTS `DouglasPeuckerSimplifier`
  * over built way geometries, we make it a declarative operator over the
  * vertex-table form (one row per vertex, the natural exploded layout of a
  * ways table).
  *
  * Deterministic rule set (an oracle needs a total order):
  *   - interval (i, j) splits at the interior vertex maximizing
  *     (⌊d²⌋, lowest idx) — d = point-to-SEGMENT distance to the chord
  *     (the robust DP variant: degenerate closed chords where i and j
  *     coincide fall back to point distance, so loops don't collapse);
  *   - it splits only if that max ⌊d²⌋ > eps² (strict), else every
  *     interior vertex of the interval is dropped;
  *   - kept set = both endpoints of every interval ever created.
  * The per-vertex kernel is the SAME fixed IEEE double chain as
  * [[MapMatch]] (exact long diffs → correctly-rounded casts → fixed op
  * order → floor), so ⌊d²⌋ is an engine-invariant integer and a DuckDB
  * recursive-CTE twin reproduces the whole recursion bit-for-bit.
  *
  * Plan (100 TB posture): ONE hash aggregate assembles each polyline
  * (sort_array ∘ collect_list — geometry assembly is the same exchange the
  * geometry builder already pays), then the recursion is map-only per
  * geometry with an explicit stack (no driver involvement, no per-interval
  * shuffles — a polyline is by construction small enough to assemble,
  * which is the premise of every geometry operator here and upstream).
  */
object Simplify {

  /** @param lines vertex table: one row per vertex
    * @param doc   polyline id column
    * @param idx   vertex order within the polyline (unique per doc)
    * @param x     micro-degree lon; @param y micro-degree lat
    * @param epsMicro tolerance: interior vertices farther than this from
    *                 the chord (strictly, on ⌊d²⌋ > eps²) survive
    * @return kept vertices (doc_id, idx, x, y)
    */
  def douglasPeucker(spark: SparkSession, lines: DataFrame, doc: Column,
                     idx: Column, x: Column, y: Column,
                     epsMicro: Long): DataFrame = {
    require(epsMicro >= 0, "epsMicro must be non-negative")
    import spark.implicits._
    val eps2 = epsMicro * epsMicro

    lines.select(doc.cast("long").as("doc_id"),
        idx.cast("long").as("idx"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("idx"), col("x"), col("y")))).as("vs"))
      .as[(Long, Seq[(Long, Long, Long)])]
      .flatMap { case (docId, vs) =>
        val n = vs.length
        val ix = vs.map(_._1).toArray
        val xs = vs.map(_._2).toArray
        val ys = vs.map(_._3).toArray
        val keep = new Array[Boolean](n)
        keep(0) = true; keep(n - 1) = true
        // explicit stack of positions — no recursion depth hazard
        var stack = List((0, n - 1))
        while (stack.nonEmpty) {
          val (i, j) = stack.head; stack = stack.tail
          if (j - i >= 2) {
            // fixed IEEE chain per interior vertex (MapMatch's kernel)
            val dx = (xs(j) - xs(i)).toDouble; val dy = (ys(j) - ys(i)).toDouble
            val len2 = dx * dx + dy * dy
            var bestD = -1L; var bestK = -1
            var k = i + 1
            while (k < j) {
              val wx = (xs(k) - xs(i)).toDouble; val wy = (ys(k) - ys(i)).toDouble
              val t = if (len2 == 0.0) 0.0
                      else math.min(math.max((wx * dx + wy * dy) / len2, 0.0), 1.0)
              val ex = wx - t * dx; val ey = wy - t * dy
              val d2q = math.floor(ex * ex + ey * ey).toLong
              if (d2q > bestD) { bestD = d2q; bestK = k } // strict > = lowest-idx tie
              k += 1
            }
            if (bestD > eps2) {
              keep(bestK) = true
              stack = (i, bestK) :: (bestK, j) :: stack
            }
          }
        }
        (0 until n).iterator.filter(keep).map(k => (docId, ix(k), xs(k), ys(k)))
      }
      .toDF("doc_id", "idx", "x", "y")
  }
}
