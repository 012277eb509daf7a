package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial-accessibility scoring — how well is each demand location served
  * by the supply sites it can reach. The downstream verb of the radius
  * join, the same way [[Dbscan]] is the downstream verb of the eps-grid:
  * site-planning, service-equity and coverage-gap questions over the point
  * corpus ("which neighborhoods are underserved by the clinics/depots they
  * can reach within d0").
  */
object Accessibility {

  /** TWO-STEP FLOATING CATCHMENT AREA [Luo & Wang 2003] — the standard
    * accessibility index:
    *
    *   step 1 (per supply site j):  R_j = S_j / Σ_{i : d(i,j) ≤ d0} P_i
    *     — capacity divided by the demand inside the site's catchment;
    *   step 2 (per demand point i): A_i = Σ_{j : d(i,j) ≤ d0} R_j
    *     — the sum of reachable sites' ratios.
    *
    * Integer-exact surrogate (the DSIR fixed-point discipline — floats
    * never cross the engine boundary): ratios are computed as
    * `R_fp = (S_j * scale) div demandSum_j` (int64 floor division, both
    * operands non-negative so `div` == floor on BOTH engines), and A_i is
    * the exact int64 sum of those fixed-point ratios. A site whose
    * catchment holds zero demand serves no one and contributes nothing
    * (R_fp = 0 — the standard 2SFCA convention of dropping empty
    * catchments). Demand points reaching no site get access_fp = 0 with
    * n_sites = 0 (zerofilled — a coverage GAP is a result, not a missing
    * row).
    *
    * Output: one row per demand point — (id, access_fp, n_sites).
    *
    * Plan (100 TB posture): the (demand, site) candidate pairs come from
    * ONE [[Knn.radiusJoinDf]] cell-grid join (3×3-ring blocking, exact
    * int64 d² filter decides — no all-pairs stage), localCheckpointed and
    * reused by BOTH steps, so the expensive spatial exchange happens once.
    * Everything downstream is hash aggregates and a site-count-sized
    * equi-join of pairs against the per-site ratio table: step 1 is one
    * map-side-combined sum per site, step 2 one per demand point. No
    * driver-side data, no broadcast of anything data-sized.
    */
  def twoStepFca(spark: SparkSession,
                 demand: DataFrame, dId: Column, dLon: Column, dLat: Column,
                 dPop: Column,
                 sites: DataFrame, sId: Column, sLon: Column, sLat: Column,
                 sCap: Column,
                 radiusMicro: Long, level: Int,
                 scale: Long = 1000000L): DataFrame = {
    require(radiusMicro > 0, "radiusMicro must be positive")
    require(scale > 0, "scale must be positive")
    val d = demand.select(dId.cast("long").as("id"), dLon.cast("long").as("dx"),
      dLat.cast("long").as("dy"), dPop.cast("long").as("pop"))
    val s = sites.select(sId.cast("long").as("sid"), sLon.cast("long").as("sx"),
      sLat.cast("long").as("sy"), sCap.cast("long").as("cap"))
    // ONE spatial exchange: (demand qid, site neighbor_id) candidate pairs
    val pairs = Knn.radiusJoinDf(spark, s, col("sid"), col("sx"), col("sy"),
        d, col("id"), col("dx"), col("dy"),
        radiusMicro = radiusMicro, level = level)
      .select(col("qid").as("id"), col("neighbor_id").as("sid"))
      .localCheckpoint()
    // step 1: catchment demand per site -> fixed-point ratio
    val ratio = pairs.join(d.select("id", "pop"), "id")
      .groupBy("sid").agg(sum("pop").as("dsum"))
      .join(s.select("sid", "cap"), "sid")
      .select(col("sid"),
        when(col("dsum") > 0, expr(s"(cap * ${scale}L) div dsum"))
          .otherwise(lit(0L)).as("r_fp"))
    // step 2: per-demand sum of reachable ratios, zerofilled over demand
    val acc = pairs.join(ratio, "sid")
      .groupBy("id").agg(sum("r_fp").as("access_fp"),
        count(lit(1)).as("n_sites"))
    d.select("id").join(acc, Seq("id"), "left")
      .select(col("id"), coalesce(col("access_fp"), lit(0L)).as("access_fp"),
        coalesce(col("n_sites"), lit(0L)).as("n_sites"))
  }

  /** HUFF GRAVITY ALLOCATION [Huff 1964] — the probabilistic catchment:
    * each demand point splits its population across the supply sites it
    * can reach, proportionally to attraction = capacity / distance² —
    * where [[twoStepFca]] scores ACCESS per demand point and
    * [[graft.operators.GridRaster.catchments]] assigns each node to ONE
    * nearest site, Huff answers the retail/market-share question: how much
    * demand does each SITE capture when customers probabilistically prefer
    * near/big sites.
    *
    * Integer-exact surrogate of the w = S/d² kernel (the [[GridRaster
    * .idwGrid]] quantized-inverse-square trick): per qualifying pair
    *   `w = (cap * wScale) div (d² div distQ + 1)`
    * — the `+ 1` guards d = 0, `distQ` keeps the quantized distance from
    * underflowing the division, both floor-divs are exact on both engines
    * (non-negative operands). Shares are then
    *   `a_ij = pop_i * w_ij div Σ_j w_ij`
    * (floor — each demand point allocates AT MOST its population; the
    * remainder ⌊⌋ discards is bounded by the site count and stays with the
    * consumer, documented rather than redistributed so every number is a
    * one-pass integer).
    *
    * Output: one row per SITE — (sid, total_alloc, n_demand), zerofilled
    * (a site capturing nothing is a result).
    *
    * Plan (100 TB posture): ONE [[Knn.radiusJoinDf]] cell-grid exchange
    * produces the qualifying pairs with their exact d²; weights and shares
    * are map-side arithmetic around two hash aggregates (per-demand denom,
    * per-site total). The final zerofill join is site-sized.
    */
  def huffAllocation(spark: SparkSession,
                     demand: DataFrame, dId: Column, dLon: Column,
                     dLat: Column, dPop: Column,
                     sites: DataFrame, sId: Column, sLon: Column,
                     sLat: Column, sCap: Column,
                     radiusMicro: Long, level: Int,
                     wScale: Long = 1000000L, distQ: Long = 1000000L)
      : DataFrame = {
    require(radiusMicro > 0, "radiusMicro must be positive")
    require(wScale > 0 && distQ > 0, "wScale/distQ must be positive")
    val d = demand.select(dId.cast("long").as("id"), dLon.cast("long").as("dx"),
      dLat.cast("long").as("dy"), dPop.cast("long").as("pop"))
    val s = sites.select(sId.cast("long").as("sid"), sLon.cast("long").as("sx"),
      sLat.cast("long").as("sy"), sCap.cast("long").as("cap"))
    val pairs = Knn.radiusJoinDf(spark, s, col("sid"), col("sx"), col("sy"),
        d, col("id"), col("dx"), col("dy"),
        radiusMicro = radiusMicro, level = level)
      .select(col("qid").as("id"), col("neighbor_id").as("sid"), col("d2"))
      .join(s.select("sid", "cap"), "sid")
      .select(col("id"), col("sid"),
        expr(s"(cap * ${wScale}L) div (d2 div ${distQ}L + 1L)").as("w"))
      .localCheckpoint()
    val denom = pairs.groupBy("id").agg(sum("w").as("wsum"))
    val alloc = pairs.join(denom, "id").join(d.select("id", "pop"), "id")
      .select(col("sid"),
        when(col("wsum") > 0, expr("(pop * w) div wsum"))
          .otherwise(lit(0L)).as("a"))
      .groupBy("sid").agg(sum("a").as("total_alloc"),
        count(lit(1)).as("n_demand"))
    s.select("sid").join(alloc, Seq("sid"), "left")
      .select(col("sid"), coalesce(col("total_alloc"), lit(0L)).as("total_alloc"),
        coalesce(col("n_demand"), lit(0L)).as("n_demand"))
  }
}
