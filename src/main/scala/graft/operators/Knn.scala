package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{FixedPoint, ZGrid}
import graft.functions.GraftFunctions._

/** kNN join via iterative cell-ring expansion (SURVEY.md C4; BASELINE.json
  * north_star "kNN via iterative H3 k-ring expansion joins" — our grid is the
  * hand-built Morton ZGrid, same k-ring idea).
  *
  * Algorithm (exact, not approximate):
  *   round r: every active query expands to the square of cells with
  *   Chebyshev cell-radius r around its own cell; the candidate set
  *   (query_id, cell) is tiny (|Q| × (2r+1)²) and BROADCAST, so each round is
  *   one broadcast hash join against the big point table (zero shuffles on
  *   the point side) + a top-k per query over candidates only.
  *   Stop when every query holds k neighbours whose kth distance is ≤ the
  *   lower bound of any unexplored cell: a point outside radius r is
  *   separated from the query by ≥ r whole cells ⇒ distance ≥ r·minCellSpan.
  *
  * Distance metric: squared planar micro-degree distance — int64-exact
  * (|Δ| ≤ 3.6e8 ⇒ Δ² ≤ 1.3e17, sum < 2.7e17 << 2^63), so ranks are
  * bit-reproducible and DuckDB's brute-force cross join is an exact oracle.
  * Ties broken by neighbour id. (Geodesic metrics would make the *pruning
  * bound* approximate; planar is the deliberate v1 contract, documented.)
  *
  * At 100 TB: the point table is scanned once per round (2–3 rounds typical
  * when `level` is chosen from point density); each scan is
  * partition-prunable by cell when the table is cell-clustered, because the
  * candidate cells are known at plan time — the driver can push
  * `cell IN (...)` before the join (done below via an optional prefilter).
  */
object Knn {
  final case class QueryPt(qid: Long, lonm: Long, latm: Long)

  /** Exact radius (range) join: all points within `radiusMicro` planar
    * micro-degrees of each query point. One broadcast equi-join on the
    * cells covering each query's bbox square (superset of the circle),
    * then the exact integer d² filter — the 1-D "range join via cells"
    * shape (SURVEY.md C-family note).
    */
  def radiusJoin(spark: SparkSession, points: DataFrame, idCol: Column,
                 lonCol: Column, latCol: Column, queries: Seq[QueryPt],
                 radiusMicro: Long, level: Int): DataFrame = {
    import spark.implicits._
    val cells = queries.flatMap { q =>
      val b = graft.core.BBoxM(q.lonm - radiusMicro, q.latm - radiusMicro,
        q.lonm + radiusMicro, q.latm + radiusMicro)
      ZGrid.bboxCells(level, b).map { case (x, y) =>
        (q.qid, q.lonm, q.latm, graft.core.Morton.encode(x, y))
      }
    }
    val cellsDf = cells.toDF("qid", "_qlon", "_qlat", "_pcell")
    val d2 = (lonCol - col("_qlon")) * (lonCol - col("_qlon")) +
             (latCol - col("_qlat")) * (latCol - col("_qlat"))
    points.select(idCol.as("neighbor_id"), lonCol, latCol)
      .withColumn("_pcell", zcell(lonCol, latCol, level))
      .join(broadcast(cellsDf), Seq("_pcell"))
      .withColumn("d2", d2)
      .where(col("d2") <= radiusMicro * radiusMicro)
      .select("qid", "neighbor_id", "d2")
  }

  /** DataFrame × DataFrame exact radius join — the distributed-query-side
    * twin of [[radiusJoin]]: each query row explodes to the cell square
    * covering its radius bbox (one round, radius is fixed), equi-join on
    * cell, exact integer d² filter. The cell cover is a superset of the
    * circle, so correctness never depends on the ring bound — only the
    * candidate count does.
    */
  def radiusJoinDf(spark: SparkSession, points: DataFrame, pId: Column,
                   pLon: Column, pLat: Column, queries: DataFrame, qId: Column,
                   qLon: Column, qLat: Column, radiusMicro: Long,
                   level: Int): DataFrame = {
    val rx = radiusMicro / (FixedPoint.LON_RANGE >> level)
    val ry = radiusMicro / (FixedPoint.LAT_RANGE >> level)
    val rr = (math.max(rx, ry) + 1).toInt
    val cand = queries.select(qId.as("qid"), qLon.as("_qlon"), qLat.as("_qlat"))
      .withColumn("_pcell", explode(ringCells(col("_qlon"), col("_qlat"), level, rr)))
    val d2 = (col("_plon") - col("_qlon")) * (col("_plon") - col("_qlon")) +
             (col("_plat") - col("_qlat")) * (col("_plat") - col("_qlat"))
    points.select(pId.as("neighbor_id"), pLon.as("_plon"), pLat.as("_plat"))
      .withColumn("_pcell", zcell(col("_plon"), col("_plat"), level))
      .join(cand, Seq("_pcell"))
      .withColumn("d2", d2)
      .where(col("d2") <= radiusMicro * radiusMicro)
      .select("qid", "neighbor_id", "d2")
  }

  /** Exact k nearest `points` rows for every query point.
    *
    * @param points   big table exposing `idCol`, `lonCol`, `latCol` (micro-deg)
    * @param queries  small driver-side query set (broadcast each round)
    * @param level    grid level for ring expansion (cells ≈ point spacing·k)
    * @param r0       initial radius guess (≥1 saves rounds when k > density)
    * @return (qid, neighbor_id, rank, d2) — exactly k rows per query unless
    *         the table holds fewer than k rows in total
    */
  def knnJoin(spark: SparkSession, points: DataFrame, idCol: Column,
              lonCol: Column, latCol: Column, queries: Seq[QueryPt], k: Int,
              level: Int, r0: Int = 1, cellPrefilter: Boolean = true): DataFrame = {
    import spark.implicits._
    require(k >= 1 && queries.nonEmpty)
    val n = 1L << level
    val minSpan = math.min(FixedPoint.LON_RANGE >> level, FixedPoint.LAT_RANGE >> level)
    val maxR = n.toInt // square covers the world ⇒ brute force fallback

    val pts = points.select(idCol.as("neighbor_id"), lonCol.as("_plon"), latCol.as("_plat"))
      .withColumn("_pcell", zcell(col("_plon"), col("_plat"), level))

    def candidateCells(r: Int): Seq[(Long, Long, Long, Long)] = // (qid,qlon,qlat,cell)
      queries.flatMap { q =>
        val qx = ZGrid.xAt(level, q.lonm); val qy = ZGrid.yAt(level, q.latm)
        for {
          x <- math.max(0L, qx - r) to math.min(n - 1, qx + r)
          y <- math.max(0L, qy - r) to math.min(n - 1, qy + r)
        } yield (q.qid, q.lonm, q.latm, graft.core.Morton.encode(x, y))
      }

    def topk(r: Int): DataFrame = {
      val cells = candidateCells(r)
      val cellsDf = cells.toDF("qid", "_qlon", "_qlat", "_pcell")
      // plan-time cell prefilter: lets a cell-clustered scan prune row groups
      val src = if (cellPrefilter && cells.size <= 100000)
        pts.where(col("_pcell").isInCollection(cells.map(_._4).distinct)) else pts
      val d2 = (col("_plon") - col("_qlon")) * (col("_plon") - col("_qlon")) +
               (col("_plat") - col("_qlat")) * (col("_plat") - col("_qlat"))
      val w = Window.partitionBy("qid").orderBy(col("d2"), col("neighbor_id"))
      src.join(broadcast(cellsDf), Seq("_pcell"))
        .withColumn("d2", d2)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "d2")
    }

    // straggler guard: past this ring size the candidate-cell list is more
    // expensive than scanning everything — brute-force the whole query set
    // (broadcast queries × one point-table pass + per-query top-k), exact
    val maxRingCellsPerQuery = 100000L

    def bruteForce(): DataFrame = {
      val qDf = queries.map(q => (q.qid, q.lonm, q.latm)).toDF("qid", "_qlon", "_qlat")
      val d2 = (col("_plon") - col("_qlon")) * (col("_plon") - col("_qlon")) +
               (col("_plat") - col("_qlat")) * (col("_plat") - col("_qlat"))
      val w = Window.partitionBy("qid").orderBy(col("d2"), col("neighbor_id"))
      pts.join(broadcast(qDf))
        .withColumn("d2", d2)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "d2")
    }

    var r = math.max(1, r0)
    var done = false
    var result: DataFrame = null
    while (!done) {
      if ((2L * r + 1) * (2L * r + 1) > maxRingCellsPerQuery) {
        return bruteForce()
      }
      result = topk(r)
      if (r >= maxR) done = true
      else {
        // (driver-side |Q| control loop — for DataFrame-valued query sets
        // use knnJoinDf, which keeps the query table distributed)
        // control decision only: k small × |Q| small ⇒ tiny collect
        val stats = result.groupBy("qid").agg(count(lit(1)).as("n"), max("d2").as("kd2"))
          .collect().map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
        val bound = r.toLong * minSpan
        // strict <: an unexplored point at EXACTLY the bound distance could
        // tie the kth neighbour's d2 and win the (d2, id) tie-break
        done = queries.forall { q =>
          stats.get(q.qid).exists { case (cnt, kd2) => cnt == k && kd2 < bound * bound }
        }
        if (!done) r = math.min(maxR, r * 2)
      }
    }
    result
  }

  /** DataFrame × DataFrame exact kNN join — the query side stays distributed
    * (no driver-side query list), so arbitrarily large query tables work:
    * tile-serving joins, all-pairs kNN, the reference's MapReducer-over-
    * entities shape.
    *
    * Per round r: every ACTIVE query row explodes to its (2r+1)² ring cells
    * (codegen RingCellsExpr — a few long columns, no strings), equi-joins the
    * point table on cell (Catalyst/AQE picks broadcast vs sort-merge from the
    * candidate side's size), then a per-query top-k window. Queries whose kth
    * neighbour distance is strictly inside the explored ring
    * (kd2 < (r·minSpan)²) are FINISHED: their rows are banked and they leave
    * the next round — the iteration only ever re-scans for stragglers in
    * sparse regions. Driver sees one scalar count per round (control only).
    *
    * Exactness argument matches [[knnJoin]]: any point outside Chebyshev cell
    * radius r is ≥ r·minSpan away in the planar metric, and the strict < on
    * the bound forbids unexplored exact ties from displacing the kth row.
    */
  def knnJoinDf(spark: SparkSession, points: DataFrame, pId: Column,
                pLon: Column, pLat: Column, queries: DataFrame, qId: Column,
                qLon: Column, qLat: Column, k: Int, level: Int,
                r0: Int = 1): DataFrame = {
    require(k >= 1)
    val minSpan = math.min(FixedPoint.LON_RANGE >> level, FixedPoint.LAT_RANGE >> level)
    val maxR = (1L << level).toInt

    val pts = points.select(pId.as("neighbor_id"), pLon.as("_plon"), pLat.as("_plat"))
      .withColumn("_pcell", zcell(col("_plon"), col("_plat"), level))
    var active = queries.select(qId.as("qid"), qLon.as("_qlon"), qLat.as("_qlat"))
      .localCheckpoint()
    var acc: DataFrame = null
    var r = math.max(1, r0)
    var remaining = active.limit(1).count()
    // straggler guard (sparse regions, |points| < k): RingCellsExpr
    // materializes a (2r+1)² long array PER ACTIVE ROW — at level 12 the
    // final doubling rounds would allocate ~16M-element (~128 MB) arrays and
    // OOM the executor before r ≥ maxR terminates. Past this cap, remaining
    // stragglers switch to a direct full-scan top-k (no ring explosion);
    // exact because the full scan needs no pruning bound.
    val maxRingCellsPerQuery = 100000L
    while (remaining > 0) {
      val ringTooBig = (2L * r + 1) * (2L * r + 1) > maxRingCellsPerQuery
      val d2 = (col("_plon") - col("_qlon")) * (col("_plon") - col("_qlon")) +
               (col("_plat") - col("_qlat")) * (col("_plat") - col("_qlat"))
      val w = Window.partitionBy("qid").orderBy(col("d2"), col("neighbor_id"))
      val joined =
        if (ringTooBig) pts.join(broadcast(active)) // stragglers are few: broadcast × full scan
        else pts.join(active.withColumn("_pcell",
          explode(ringCells(col("_qlon"), col("_qlat"), level, r))), Seq("_pcell"))
      val topk = joined
        .withColumn("d2", d2)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "d2")
      val bound = r.toLong * minSpan
      val doneIds =
        if (r >= maxR || ringTooBig) active.select("qid") // whole world explored
        else topk.groupBy("qid")
          .agg(count(lit(1)).as("_n"), max("d2").as("_kd2"))
          .where(col("_n") === k && col("_kd2") < bound * bound)
          .select("qid")
      // banked eagerly: k rows per finished query materialize once; a lazy
      // union would re-run every round's join at the final action (measured
      // equal at fixture scale, strictly worse at 100k-query scale)
      val finished = topk.join(doneIds, Seq("qid"), "left_semi").localCheckpoint()
      acc = if (acc == null) finished else acc.union(finished)
      active = active.join(doneIds, Seq("qid"), "left_anti").localCheckpoint()
      remaining = active.limit(1).count()
      r = math.min(maxR, r * 2)
    }
    if (acc == null) active.select(col("qid"), col("qid").as("neighbor_id"),
      lit(0).as("rank"), lit(0L).as("d2")).where(lit(false))
    else acc
  }
}
