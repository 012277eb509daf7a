package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory segmentation — split each entity's time-ordered position
  * stream into TRIPS at dwell gaps, and reduce each trip to its metrics
  * (the sessionization verb of every GPS/telemetry pipeline; upstream
  * users get this by composing OSHDB's contribution stream with manual
  * window logic — we make it one operator).
  *
  * Semantics: per entity, order fixes by (t, orderId) — orderId breaks
  * timestamp ties deterministically. A fix STARTS A NEW TRIP iff it is the
  * entity's first fix or its gap to the previous fix exceeds `gapUs`
  * (strictly >). Trips are numbered 0.. per entity in time order. Each trip
  * reduces to: fix count, start time, duration (last − first, µs), and
  * path length = Σ hop lengths, where a hop's length is
  * ⌊√(dx² + dy²)⌋ planar micro-degrees (the trip's first fix contributes 0).
  *
  * Exactness / oracle parity: dx, dy are exact int64 differences; the hop
  * kernel is a FIXED IEEE chain (the q74 trick) — cast to double (exact,
  * |coords| < 2^53), dx·dx + dy·dy (correctly-rounded mul/add in fixed
  * left-to-right order), IEEE-754 sqrt (correctly rounded BY THE STANDARD,
  * unlike libm transcendentals) — so ⌊·⌋ is an engine-invariant integer and
  * the per-trip SUM of hops is exact int64 arithmetic any engine
  * reproduces bit-for-bit.
  *
  * Plan (100 TB posture): ONE hash exchange on the entity key; both window
  * functions and the final aggregate reuse it (the aggregate keys
  * (entity, trip) are a refinement of the window partitioning, so Catalyst
  * plans no second exchange). The per-entity sort is task-local and spills;
  * there is no global sort and no driver-side state. Skew = one entity's
  * full history in one task — the standard sessionization bound; cap
  * retention upstream if an entity can exceed a task's spill budget.
  */
object Trajectory {

  /** @param fixes   position stream
    * @param entity  grouping key (device / user id)
    * @param tUs     event time, int64 microseconds
    * @param orderId unique per-row tie-break for equal timestamps
    * @param lon     longitude, micro-degrees (int64)
    * @param lat     latitude, micro-degrees (int64)
    * @param gapUs   dwell gap that splits trips (strictly greater starts new)
    * @return (entity, trip_no, n_pts, start_us, dur_us, len_q) — one row
    *         per trip, len_q in floor-quantized planar micro-degrees
    */
  def trips(fixes: DataFrame, entity: Column, tUs: Column, orderId: Column,
            lon: Column, lat: Column, gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))

    val base = fixes.select(entity.cast("long").as("_ent"),
      tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
      lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))

    val lagged = base
      .withColumn("_ptus", lag(col("_tus"), 1).over(w))
      .withColumn("_plon", lag(col("_lon"), 1).over(w))
      .withColumn("_plat", lag(col("_lat"), 1).over(w))
      .withColumn("_new",
        when(col("_ptus").isNull || col("_tus") - col("_ptus") > gapUs, 1L)
          .otherwise(0L))

    // fixed IEEE hop chain — identical op order to the DuckDB twin
    val dx = (col("_lon") - col("_plon")).cast("double")
    val dy = (col("_lat") - col("_plat")).cast("double")
    val hop = when(col("_new") === 1L, lit(0L))
      .otherwise(floor(sqrt(dx * dx + dy * dy)).cast("long"))

    lagged
      .withColumn("_trip",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .withColumn("_hop", hop)
      .groupBy(col("_ent").as("entity"), col("_trip").as("trip_no"))
      .agg(count(lit(1)).as("n_pts"),
        min(col("_tus")).as("start_us"),
        (max(col("_tus")) - min(col("_tus"))).as("dur_us"),
        sum(col("_hop")).as("len_q"))
  }

  /** STAY-POINT (dwell) detection — the place-based complement of [[trips]]
    * (which segments by time gaps): per entity, each MAXIMAL run of
    * consecutive fixes inside one grid cell that lasts ≥ `minStayUs` and
    * has ≥ `minFixes` fixes is a stay point — "where did this entity
    * actually spend time", the primitive under visit mining, POI
    * extraction and OD endpoints [Li et al. 2008, grid-quantized].
    * Quantization is the semantics (the q92 discipline): cell membership
    * is an exact integer predicate, so runs — and therefore every emitted
    * number — are engine-invariant, where the classical radius rule's
    * float centroid chain is not.
    *
    * Consecutive = adjacent in the (t, orderId) order; a single far fix
    * inside a dwell breaks the run (GPS jitter is the caller's smoothing
    * concern — pick the cell size to absorb it). Runs, not visits: the
    * same cell revisited later is a NEW stay point.
    *
    * Output: (entity, cx, cy, enter_us, exit_us, n_fixes) per stay point.
    *
    * Plan (100 TB posture): ONE hash exchange on the entity key serves the
    * lag window, the run-numbering running sum AND the per-(entity, run)
    * aggregate (the agg keys refine the window partitioning — the [[trips]]
    * discipline); the duration/count gates are post-aggregate filters on
    * run-sized rows. Shift-before-div keeps cell assignment
    * engine-invariant (trunc = floor on non-negative operands).
    */
  def stayPoints(fixes: DataFrame, entity: Column, tUs: Column,
                 orderId: Column, lon: Column, lat: Column, cellMicro: Long,
                 minStayUs: Long, minFixes: Long,
                 lonShift: Long = 180000000L, latShift: Long = 90000000L)
      : DataFrame = {
    require(cellMicro > 0 && minStayUs >= 0 && minFixes >= 1,
      "need cellMicro > 0, minStayUs >= 0, minFixes >= 1")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))
    val g = cellMicro
    val base = fixes.select(entity.cast("long").as("_ent"),
        tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
        lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
      .select(col("_ent"), col("_tus"), col("_oid"),
        expr(s"(_lon + $lonShift) div $g").as("_cx"),
        expr(s"(_lat + $latShift) div $g").as("_cy"))
    base
      .withColumn("_new",
        when(lag(col("_cx"), 1).over(w).isNull
            || lag(col("_cx"), 1).over(w) =!= col("_cx")
            || lag(col("_cy"), 1).over(w) =!= col("_cy"), 1L)
          .otherwise(0L))
      .withColumn("_run",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("_ent").as("entity"), col("_run"))
      .agg(min(col("_cx")).as("cx"), min(col("_cy")).as("cy"),
        min(col("_tus")).as("enter_us"), max(col("_tus")).as("exit_us"),
        count(lit(1)).as("n_fixes"))
      .where(col("exit_us") - col("enter_us") >= minStayUs
        && col("n_fixes") >= minFixes)
      .drop("_run")
  }

  /** Origin–destination flow matrix — the aggregate mobility verb on top
    * of trip segmentation ("how many trips start in cell A and end in cell
    * B"): each trip contributes one flow from its FIRST fix's cell to its
    * LAST fix's cell (order = (t, orderId), the [[trips]] rule), counted
    * per directed cell pair.
    *
    * Cells are `⌊(coord + shift) / cellMicro⌋` with the caller-supplied
    * shift making coordinates non-negative FIRST — integer division
    * truncates toward zero in some engines and floors in others, so the
    * rule is only engine-invariant on non-negative operands (the same
    * discipline as the tile operators).
    *
    * Plan (100 TB posture): the entity exchange serves the trip-numbering
    * window AND the per-(entity, trip) min_by/max_by endpoint aggregate
    * (its keys refine the window partitioning); the only other exchange is
    * the final hash count on the cell-pair key. min_by/max_by keyed by the
    * unique (t, orderId) pair make endpoint election a map-side-partial
    * aggregate — no per-trip sort, no second window.
    */
  def odMatrix(fixes: DataFrame, entity: Column, tUs: Column, orderId: Column,
               lon: Column, lat: Column, gapUs: Long,
               cellMicro: Long, lonShift: Long = 180000000L,
               latShift: Long = 90000000L): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    require(cellMicro > 0, "cellMicro must be positive")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))

    val base = fixes.select(entity.cast("long").as("_ent"),
      tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
      lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))

    val withTrip = base
      .withColumn("_ptus", lag(col("_tus"), 1).over(w))
      .withColumn("_new",
        when(col("_ptus").isNull || col("_tus") - col("_ptus") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("_trip",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)

    withTrip
      .groupBy(col("_ent"), col("_trip"))
      .agg(
        min_by(struct(col("_lon"), col("_lat")), struct(col("_tus"), col("_oid"))).as("_o"),
        max_by(struct(col("_lon"), col("_lat")), struct(col("_tus"), col("_oid"))).as("_d"))
      .select(
        (col("_o._lon") + lonShift).as("_osx"), (col("_o._lat") + latShift).as("_osy"),
        (col("_d._lon") + lonShift).as("_dsx"), (col("_d._lat") + latShift).as("_dsy"))
      // `div` (exact int64 trunc) — non-negative operands make trunc ≡ floor
      .select(
        expr(s"_osx div $cellMicro").as("o_cx"),
        expr(s"_osy div $cellMicro").as("o_cy"),
        expr(s"_dsx div $cellMicro").as("d_cx"),
        expr(s"_dsy div $cellMicro").as("d_cy"))
      .groupBy("o_cx", "o_cy", "d_cx", "d_cy")
      .agg(count(lit(1)).as("flows"))
  }

  /** Spatiotemporal CO-LOCATION join — pairs of DISTINCT entities observed
    * within planar distance ≤ `radiusMicro` AND within time ≤ `tauUs` of
    * each other, counted per unordered entity pair (the contact/encounter
    * verb: proximity tracing, co-travel detection, wildlife-encounter
    * analysis). One output row per pair with its contact-event count.
    *
    * Scale re-expression (the [[graft.operators.Dedup.geoHammingPairs]]
    * discipline extended with a TIME axis): candidates come from a
    * (space cell × τ-bucket) grid, never an all-pairs stage — the
    * b-side contributes its ONE (cell, bucket) key, the a-side explodes to
    * its Chebyshev cell ring × {tb−1, tb, tb+1}, and `a.ent < b.ent` picks
    * one orientation. Containment: dist ≤ r bounds the cell-index gap by
    * the ring radius (the radius-join argument), and |Δt| ≤ τ bounds the
    * τ-bucket gap by 1 for ANY sign of t (bucket boundaries are τ apart;
    * a closed interval of length τ spans at most one boundary — trunc vs
    * floor only re-labels the bucket at 0, never widens a gap past 1).
    * The ring's (cell, bucket) keys are DISTINCT, so each qualifying fix
    * pair is produced exactly ONCE — no dedup exchange. The exchange is
    * ∝ co-located candidate pairs; city-hotspot skew fans out over many
    * cells and AQE splits the rest. Exact predicates (int64 d², |Δt|)
    * decide membership — blocking affects cost only, never the answer.
    */
  def coLocation(fixes: DataFrame, entity: Column, tUs: Column,
                 lon: Column, lat: Column, radiusMicro: Long, tauUs: Long,
                 level: Int): DataFrame = {
    require(radiusMicro > 0, "radiusMicro must be positive")
    require(tauUs > 0, "tauUs must be positive")
    require(level >= 1 && level <= 16, "level out of range")
    import graft.core.FixedPoint
    val base = fixes.select(entity.cast("long").as("ent"),
      tUs.cast("long").as("tus"), lon.cast("long").as("lon"),
      lat.cast("long").as("lat"))
    val rx = radiusMicro / (FixedPoint.LON_RANGE >> level)
    val ry = radiusMicro / (FixedPoint.LAT_RANGE >> level)
    val rr = (math.max(rx, ry) + 1).toInt
    val tb = expr(s"tus div ${tauUs}L")
    val cellSide = base
      .withColumn("_cell",
        graft.functions.GraftFunctions.zcell(col("lon"), col("lat"), level))
      .withColumn("_tb", tb)
    val ringSide = base
      .withColumn("_cell", explode(
        graft.functions.GraftFunctions.ringCells(col("lon"), col("lat"), level, rr)))
      .withColumn("_tb", explode(array(tb - 1L, tb, tb + 1L)))
    val ddx = col("b.lon") - col("a.lon")
    val ddy = col("b.lat") - col("a.lat")
    ringSide.as("a").join(cellSide.as("b"),
        col("a._cell") === col("b._cell") && col("a._tb") === col("b._tb") &&
        col("a.ent") < col("b.ent"))
      .where(abs(col("a.tus") - col("b.tus")) <= tauUs &&
        ddx * ddx + ddy * ddy <= radiusMicro * radiusMicro)
      .groupBy(col("a.ent").as("ent_a"), col("b.ent").as("ent_b"))
      .agg(count(lit(1)).as("contacts"))
  }

  /** GRID-QUANTIZED discrete FRÉCHET distance [Eiter & Mannila 1994] — the
    * ORDER-AWARE trajectory similarity: for every entity pair sharing a
    * visited cell, the coupled-walk distance² between their VISIT
    * SEQUENCES (run-collapsed cell sequences in (t, orderId) order).
    * [[gridHausdorff]] compares visited-cell SETS — two buses driving the
    * same loop in opposite directions are Hausdorff-identical but Fréchet
    * keeps them far apart (the spec pins exactly this case). Same
    * quantization-is-the-semantics discipline as q92: cell indices and d²
    * are exact int64, so the DP — and its SQL replay — is engine-invariant.
    *
    * F(i,j) = max(d²(aᵢ,bⱼ), min(F(i−1,j), F(i,j−1), F(i−1,j−1))), answer
    * F(n,m). Entities with more than `maxVisits` visits are EXCLUDED
    * (counted first, filtered, then paired — the [[placeCoVisits]] cap
    * discipline): the DP is Θ(n·m) per pair, and the cap is the published
    * cost bound, not a silent truncation.
    *
    * Output: (ent_a, ent_b, frechet_d2) per co-visiting kept pair.
    *
    * Plan (100 TB posture): ONE entity exchange builds the ordered visit
    * sequences (run windows + per-run aggregate + bounded collect_list —
    * ≤ maxVisits structs per entity); candidate pairs come from the
    * co-visitation cell equi-join (no all-pairs); the two sequence joins
    * are raster/entity-sized; the DP itself is a MAP-ONLY rolling-array
    * kernel over (pair, seqA, seqB) rows — O(maxVisits) memory, no
    * shuffle, no driver state.
    */
  def gridFrechet(fixes: DataFrame, entity: Column, tUs: Column,
                  orderId: Column, lon: Column, lat: Column,
                  cellMicro: Long, maxVisits: Int = 64): DataFrame = {
    require(cellMicro > 0 && maxVisits >= 1,
      "need cellMicro > 0 and maxVisits >= 1")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))
    val g = cellMicro
    val base = fixes.select(entity.cast("long").as("_ent"),
        tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
        lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
      .select(col("_ent"), col("_tus"), col("_oid"),
        expr(s"(_lon + 180000000) div $g").as("_cx"),
        expr(s"(_lat + 90000000) div $g").as("_cy"))
    val seqs = base
      .withColumn("_new",
        when(lag(col("_cx"), 1).over(w).isNull
            || lag(col("_cx"), 1).over(w) =!= col("_cx")
            || lag(col("_cy"), 1).over(w) =!= col("_cy"), 1L)
          .otherwise(0L))
      .withColumn("_run",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("_ent"), col("_run"))
      .agg(min(col("_cx")).as("_cx"), min(col("_cy")).as("_cy"))
      .groupBy("_ent")
      .agg(array_sort(collect_list(struct(col("_run"), col("_cx"),
        col("_cy")))).as("_seq"))
      .where(size(col("_seq")) <= maxVisits)
      .select(col("_ent").as("ent"),
        expr("transform(_seq, s -> struct(s._cx as cx, s._cy as cy))")
          .as("seq"))
      .localCheckpoint() // feeds the pair join and both sequence joins
    val cells = seqs.select(col("ent"), explode(col("seq")).as("c"))
      .select(col("ent"), (col("c.cx") * 1073741824L + col("c.cy")).as("cell"))
      .distinct()
    val pairs = cells.select(col("ent").as("ent_a"), col("cell"))
      .join(cells.select(col("ent").as("ent_b"), col("cell")), "cell")
      .where(col("ent_a") < col("ent_b"))
      .select("ent_a", "ent_b").distinct()
    val joined = pairs
      .join(seqs.select(col("ent").as("ent_a"), col("seq").as("sa")), "ent_a")
      .join(seqs.select(col("ent").as("ent_b"), col("seq").as("sb")), "ent_b")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ent_a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ent_b",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("frechet_d2",
        org.apache.spark.sql.types.LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    joined.select("ent_a", "ent_b", "sa", "sb").mapPartitions { it =>
      it.map { r =>
        def arr(i: Int): Array[(Long, Long)] =
          r.getSeq[org.apache.spark.sql.Row](i)
            .map(s => (s.getLong(0), s.getLong(1))).toArray
        val a = arr(2); val b = arr(3)
        @inline def d2(i: Int, j: Int): Long = {
          val dx = a(i)._1 - b(j)._1; val dy = a(i)._2 - b(j)._2
          dx * dx + dy * dy
        }
        val prev = new Array[Long](b.length)
        val cur = new Array[Long](b.length)
        var i = 0
        while (i < a.length) {
          var j = 0
          while (j < b.length) {
            val best =
              if (i == 0 && j == 0) 0L
              else if (i == 0) cur(j - 1)
              else if (j == 0) prev(0)
              else math.min(math.min(prev(j), prev(j - 1)), cur(j - 1))
            cur(j) = math.max(d2(i, j), best)
            j += 1
          }
          System.arraycopy(cur, 0, prev, 0, b.length)
          i += 1
        }
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(1),
          prev(b.length - 1))
      }
    }(enc)
  }

  /** PLACE CO-VISITATION similarity — the "people who go here also go
    * there" matrix: for every unordered pair of cells sharing at least one
    * visitor, the count of common visitors, plus each side's own visitor
    * count so the consumer's one division yields Jaccard (or cosine/PMI).
    * The place-similarity primitive under venue recommendation, catchment
    * overlap and neighborhood embedding — the bipartite
    * (entity × place) projection, market-basket shape.
    *
    * Entities with a footprint above `maxFootprint` DISTINCT cells are
    * excluded entirely (count them first, filter, then pair) — the
    * standard basket cap: a bot or logistics fleet visiting thousands of
    * cells contributes O(F²) pairs of pure noise; the cap is the knob and
    * the exclusion is exact, not sampled.
    *
    * Output: (a_cx, a_cy, b_cx, b_cy, co_visitors, n_a, n_b) with
    * (a_cx, a_cy) < (b_cx, b_cy) lexicographically.
    *
    * Plan (100 TB posture): fixes distinct-collapse to (entity, cell) in
    * exchange one; the footprint filter is one count aggregate on the same
    * key; pairs come from the per-entity self-join (fan-out ≤
    * maxFootprint² per entity — bounded by the cap, no all-pairs over
    * cells); the per-cell visitor counts join back by cell key
    * (AQE-broadcast at raster size).
    */
  def placeCoVisits(fixes: DataFrame, entity: Column, lon: Column,
                    lat: Column, cellMicro: Long, maxFootprint: Int = 256,
                    lonShift: Long = 180000000L, latShift: Long = 90000000L)
      : DataFrame = {
    require(cellMicro > 0 && maxFootprint >= 1,
      "need cellMicro > 0 and maxFootprint >= 1")
    val g = cellMicro
    val K = 1073741824L
    val visits = fixes.select(entity.cast("long").as("ent"),
        lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
      .select(col("ent"),
        (expr(s"(_lon + $lonShift) div $g") * K +
          expr(s"(_lat + $latShift) div $g")).as("cell"))
      .groupBy("ent", "cell").agg(count(lit(1)).as("_n")).drop("_n")
      .localCheckpoint() // feeds footprints, pairs and per-cell counts
    val kept = visits.join(
      visits.groupBy("ent").agg(count(lit(1)).as("_f"))
        .where(col("_f") <= maxFootprint).drop("_f"),
      "ent")
    // visitor counts over the KEPT population — co/n must share a universe
    // or the consumer's Jaccard is incoherent
    val cellN = kept.groupBy("cell").agg(count(lit(1)).as("nv"))
    val pairs = kept.select(col("ent"), col("cell").as("ca"))
      .join(kept.select(col("ent"), col("cell").as("cb")), "ent")
      .where(col("ca") < col("cb"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("co_visitors"))
    pairs
      .join(cellN.select(col("cell").as("ca"), col("nv").as("n_a")), "ca")
      .join(cellN.select(col("cell").as("cb"), col("nv").as("n_b")), "cb")
      .select(expr(s"ca div ${K}L").as("a_cx"), (col("ca") % K).as("a_cy"),
        expr(s"cb div ${K}L").as("b_cx"), (col("cb") % K).as("b_cy"),
        col("co_visitors"), col("n_a"), col("n_b"))
  }

  /** ANCHOR-CELL inference — each entity's top-K cells by TOTAL DWELL TIME
    * (sum of its same-cell run durations there): rank 1 ≈ home, rank 2 ≈
    * work in the classical mobility reading — the aggregate that turns raw
    * fixes into a per-entity place profile (and feeds OD semantics,
    * mixture priors, coverage QA). Dwell is run-based, not fix-count-based:
    * a cell visited once for 10 h outranks one pinged 50 times in passing
    * — runs are the [[stayPoints]] collapse without gates, so single-fix
    * runs contribute 0 dwell but still count fixes.
    *
    * Ranking is deterministic: (dwell DESC, n_fixes DESC, cx, cy) — ties
    * cannot make the output engine-dependent.
    *
    * Output: (entity, rank, cx, cy, dwell_us, n_fixes), rank ∈ [1, topK].
    *
    * Plan (100 TB posture): ONE entity-key exchange serves everything —
    * the run lag/sum windows, the per-run aggregate, the per-(entity,
    * cell) dwell aggregate AND the rank window (each stage's keys refine
    * the previous partitioning); the rank filter bounds output to
    * topK rows per entity.
    */
  def anchorCells(fixes: DataFrame, entity: Column, tUs: Column,
                  orderId: Column, lon: Column, lat: Column,
                  cellMicro: Long, topK: Int,
                  lonShift: Long = 180000000L, latShift: Long = 90000000L)
      : DataFrame = {
    require(cellMicro > 0 && topK >= 1, "need cellMicro > 0 and topK >= 1")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))
    val g = cellMicro
    val base = fixes.select(entity.cast("long").as("_ent"),
        tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
        lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
      .select(col("_ent"), col("_tus"), col("_oid"),
        expr(s"(_lon + $lonShift) div $g").as("_cx"),
        expr(s"(_lat + $latShift) div $g").as("_cy"))
    val rank = Window.partitionBy(col("_ent"))
      .orderBy(col("dwell_us").desc, col("n_fixes").desc, col("_cx"), col("_cy"))
    base
      .withColumn("_new",
        when(lag(col("_cx"), 1).over(w).isNull
            || lag(col("_cx"), 1).over(w) =!= col("_cx")
            || lag(col("_cy"), 1).over(w) =!= col("_cy"), 1L)
          .otherwise(0L))
      .withColumn("_run",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("_ent"), col("_run"))
      .agg(min(col("_cx")).as("_cx"), min(col("_cy")).as("_cy"),
        (max(col("_tus")) - min(col("_tus"))).as("_dur"),
        count(lit(1)).as("_n"))
      .groupBy(col("_ent"), col("_cx"), col("_cy"))
      .agg(sum(col("_dur")).as("dwell_us"), sum(col("_n")).as("n_fixes"))
      .withColumn("rank", row_number().over(rank).cast("long"))
      .where(col("rank") <= topK)
      .select(col("_ent").as("entity"), col("rank"), col("_cx").as("cx"),
        col("_cy").as("cy"), col("dwell_us"), col("n_fixes"))
  }

  /** NEXT-LOCATION prediction evaluation — the eval harness for the
    * first-order mobility model: split every entity's VISIT sequence by
    * time (first ⌊trainPermille·n/1000⌋ visits train, the rest test),
    * fit the global [[cellTransitions]] matrix on the train transitions,
    * predict each test transition's destination as the train-argmax
    * successor of its from-cell (ties → lexicographically smallest cell),
    * and count hits — the "how predictable is this corpus" number
    * [Song et al. 2010's question, evaluated the way a next-POI baseline
    * is]. A from-cell never seen in training predicts nothing and counts
    * as a MISS (the honest convention — excluding unseen states inflates
    * hit rates).
    *
    * Everything is integer-deterministic: the split index is an integer
    * floor per entity, the argmax tie-breaks on the cell key, and the
    * output is ONE row (n_test, n_hit) — the hit RATE is the consumer's
    * division.
    *
    * Plan: ONE entity exchange builds visits, indices and the per-entity
    * count (the agg keys refine the window partitioning throughout); the
    * model is a (from, to) hash count + per-from argmax through
    * [[graft.functions.ArgMinLongsAgg]] (no sort, no window over the
    * matrix); eval is one equi-join of test transitions against the
    * from-keyed model. No driver-side structure.
    */
  def nextCellEval(fixes: DataFrame, entity: Column, tUs: Column,
                   orderId: Column, lon: Column, lat: Column,
                   cellMicro: Long, trainPermille: Int = 700,
                   lonShift: Long = 180000000L, latShift: Long = 90000000L)
      : DataFrame = {
    require(cellMicro > 0, "cellMicro must be positive")
    require(trainPermille >= 1 && trainPermille <= 999,
      "trainPermille in [1, 999]")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))
    val wr = Window.partitionBy(col("_ent")).orderBy(col("_run"))
    val g = cellMicro
    val base = fixes.select(entity.cast("long").as("_ent"),
        tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
        lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
      .select(col("_ent"), col("_tus"), col("_oid"),
        expr(s"(_lon + $lonShift) div $g").as("_cx"),
        expr(s"(_lat + $latShift) div $g").as("_cy"))
    val trans = base
      .withColumn("_new",
        when(lag(col("_cx"), 1).over(w).isNull
            || lag(col("_cx"), 1).over(w) =!= col("_cx")
            || lag(col("_cy"), 1).over(w) =!= col("_cy"), 1L)
          .otherwise(0L))
      .withColumn("_run",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("_ent"), col("_run"))
      .agg(min(col("_cx")).as("_cx"), min(col("_cy")).as("_cy"))
      .withColumn("_i", row_number().over(wr).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_ent"))))
      .withColumn("_pcx", lag(col("_cx"), 1).over(wr))
      .withColumn("_pcy", lag(col("_cy"), 1).over(wr))
      .where(col("_pcx").isNotNull)
      // transition arriving at visit i is TRAIN iff i ≤ ⌊p·n/1000⌋
      .withColumn("_train",
        col("_i") <= expr(s"(_n * $trainPermille) div 1000"))
      .select(col("_pcx").as("fx"), col("_pcy").as("fy"),
        col("_cx").as("tx"), col("_cy").as("ty"), col("_train"))
      .localCheckpoint() // feeds the model and the eval side
    val model = trans.where(col("_train"))
      .groupBy("fx", "fy", "tx", "ty").agg(count(lit(1)).as("_c"))
      .groupBy("fx", "fy")
      .agg(graft.functions.ArgMinLongsAgg.argminLongs(
        struct((-col("_c")).as("nc"), col("tx"), col("ty"))).as("_p"))
      .select(col("fx"), col("fy"), col("_p.tx").as("px"),
        col("_p.ty").as("py"))
    trans.where(!col("_train"))
      .join(model, Seq("fx", "fy"), "left")
      .agg(count(lit(1)).as("n_test"),
        coalesce(sum(when(col("px") === col("tx") && col("py") === col("ty"),
          1L).otherwise(0L)), lit(0L)).as("n_hit"))
  }

  /** GPS TELEPORT flagging — the cleaning verb in front of every
    * trajectory pipeline: flag fixes whose implied speed from the previous
    * fix exceeds `maxSpeed` (µdeg/second) — device glitches, tower jumps,
    * A-GPS cold fixes. One-pass semantics: each fix is judged against its
    * IMMEDIATE predecessor in (t, orderId) order (re-judging survivors
    * against the previous CLEAN fix is an iterative fixpoint — run the
    * operator again on the filtered stream if the corpus needs it; one
    * pass is the standard first gate). A first fix has no predecessor and
    * never flags; a zero-dt pair with any displacement is infinite speed
    * and flags.
    *
    * The speed test is integer-exact: hop = ⌊√(dx²+dy²)⌋ (the [[trips]]
    * fixed IEEE chain, engine-invariant) and the predicate is
    * hop·10⁶ > maxSpeed·Δt in int64 (ceilings: hop ≤ 4.2e8 ⇒ lhs ≤ 4.2e14;
    * maxSpeed·Δt must stay < 2^63 — a month of Δt allows maxSpeed to
    * ~3.5e6 µdeg/s, far past any vehicle).
    *
    * Output: flagged fixes (entity, tus, oid, hop_q, dt_us).
    *
    * Plan: ONE entity-key exchange, two lag windows, a codegen filter —
    * the [[trips]] discipline with nothing after the window but the
    * predicate.
    */
  def flagTeleports(fixes: DataFrame, entity: Column, tUs: Column,
                    orderId: Column, lon: Column, lat: Column,
                    maxSpeedMicroPerSec: Long): DataFrame = {
    require(maxSpeedMicroPerSec > 0, "maxSpeed must be positive")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))
    val base = fixes.select(entity.cast("long").as("_ent"),
      tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
      lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
    val dx = (col("_lon") - col("_plon")).cast("double")
    val dy = (col("_lat") - col("_plat")).cast("double")
    base
      .withColumn("_ptus", lag(col("_tus"), 1).over(w))
      .withColumn("_plon", lag(col("_lon"), 1).over(w))
      .withColumn("_plat", lag(col("_lat"), 1).over(w))
      .where(col("_ptus").isNotNull)
      .withColumn("_hop", floor(sqrt(dx * dx + dy * dy)).cast("long"))
      .withColumn("_dt", col("_tus") - col("_ptus"))
      .where(col("_hop") * 1000000L > lit(maxSpeedMicroPerSec) * col("_dt"))
      .select(col("_ent").as("entity"), col("_tus").as("tus"),
        col("_oid").as("oid"), col("_hop").as("hop_q"), col("_dt").as("dt_us"))
  }

  /** CELL-TRANSITION matrix — the first-order mobility model ("Markov
    * chain over places"): collapse each entity's fix stream into its
    * sequence of visited cells (consecutive same-cell fixes are ONE
    * visit — the [[stayPoints]] run rule without gates), then count every
    * directed transition between successive visit cells, across all
    * entities. The resulting (from, to, count) matrix is the standard
    * input to next-location prediction, flow mapping and random-walk null
    * models — [[odMatrix]] keeps only trip endpoints, this keeps every
    * intermediate movement edge.
    *
    * Output: (f_cx, f_cy, t_cx, t_cy, n_transitions), from ≠ to by
    * construction (same-cell fixes collapse before the lag).
    *
    * Plan (100 TB posture): ONE entity-key exchange serves the cell-change
    * lag, the run-numbering sum, the per-run representative aggregate AND
    * the run-successor lag (run keys refine the window partitioning); the
    * only other exchange is the final hash count on the cell-pair key.
    * Shift-before-div cell assignment (engine-invariant).
    */
  def cellTransitions(fixes: DataFrame, entity: Column, tUs: Column,
                      orderId: Column, lon: Column, lat: Column,
                      cellMicro: Long, lonShift: Long = 180000000L,
                      latShift: Long = 90000000L): DataFrame = {
    require(cellMicro > 0, "cellMicro must be positive")
    val w = Window.partitionBy(col("_ent")).orderBy(col("_tus"), col("_oid"))
    val g = cellMicro
    val base = fixes.select(entity.cast("long").as("_ent"),
        tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
        lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
      .select(col("_ent"), col("_tus"), col("_oid"),
        expr(s"(_lon + $lonShift) div $g").as("_cx"),
        expr(s"(_lat + $latShift) div $g").as("_cy"))
    val wr = Window.partitionBy(col("_ent")).orderBy(col("_run"))
    base
      .withColumn("_new",
        when(lag(col("_cx"), 1).over(w).isNull
            || lag(col("_cx"), 1).over(w) =!= col("_cx")
            || lag(col("_cy"), 1).over(w) =!= col("_cy"), 1L)
          .otherwise(0L))
      .withColumn("_run",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("_ent"), col("_run"))
      .agg(min(col("_cx")).as("_cx"), min(col("_cy")).as("_cy"))
      .withColumn("_pcx", lag(col("_cx"), 1).over(wr))
      .withColumn("_pcy", lag(col("_cy"), 1).over(wr))
      .where(col("_pcx").isNotNull)
      .groupBy(col("_pcx").as("f_cx"), col("_pcy").as("f_cy"),
        col("_cx").as("t_cx"), col("_cy").as("t_cy"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** GEOFENCE transition events — the real-time geospatial verb (fleet
    * compliance, arrival alerts, zone billing): for each (entity, fence)
    * pair, emit one event per boundary CROSSING of the entity's
    * (t, orderId)-ordered fix stream — `enter = 1` when a fix is inside a
    * fence its previous fix was not, `enter = 0` on the way out. An
    * entity's FIRST fix inside a fence is an enter (state unknown before
    * observation begins); a first fix outside emits nothing. Containment
    * is the inclusive integer bbox test (boundary fixes are inside —
    * the H6 seam discipline), so the event set is engine-invariant.
    *
    * Fences: axis-aligned rect rows (fence_id, lon_min, lat_min, lon_max,
    * lat_max) — the operator broadcasts them, the standard geofencing
    * cardinality (thousands of fences, billions of fixes).
    *
    * Output: (entity, fence_id, tus, enter) per transition.
    *
    * Plan (100 TB posture): the fix stream crosses the broadcast fence
    * table ONCE as a MAP-SIDE filter keeping only INSIDE rows (codegen
    * nested loop, no shuffle, no sort) — its distinct (entity, fence)
    * pairs are the ACTIVE series, the only ones that can ever emit (a
    * series with zero inside fixes is constant-0 under the lag and
    * produces nothing, so dropping it is exact, not an approximation).
    * Each active pair then pulls the entity's FULL fix series (exits need
    * the outside fixes) through ONE (entity, fence) window exchange — so
    * the sorted volume is Σ_active |fixes(entity)|, typically ≈ the fix
    * count × the few fences an entity actually touches, NOT fixes ×
    * fences. Measured at 16M fixes × 64 fences (Round5bStress): 243 s for
    * the naive full flag series vs 3.5 s with the active-pair prefilter —
    * the 1G-row sort was the entire cost.
    */
  def geofenceEvents(fixes: DataFrame, entity: Column, tUs: Column,
                     orderId: Column, lon: Column, lat: Column,
                     fences: DataFrame): DataFrame = {
    val base = fixes.select(entity.cast("long").as("_ent"),
      tUs.cast("long").as("_tus"), orderId.cast("long").as("_oid"),
      lon.cast("long").as("_lon"), lat.cast("long").as("_lat"))
    val f = fences.select(col("fence_id").cast("long").as("_fid"),
      col("lon_min").cast("long").as("_flo"), col("lat_min").cast("long").as("_fla"),
      col("lon_max").cast("long").as("_fhi"), col("lat_max").cast("long").as("_fha"))
    val insidePred = col("_lon") >= col("_flo") && col("_lon") <= col("_fhi") &&
      col("_lat") >= col("_fla") && col("_lat") <= col("_fha")
    val active = base.crossJoin(broadcast(f))
      .where(insidePred)
      .select(col("_ent"), col("_fid"), col("_flo"), col("_fla"),
        col("_fhi"), col("_fha"))
      .distinct()
    val w = Window.partitionBy(col("_ent"), col("_fid"))
      .orderBy(col("_tus"), col("_oid"))
    base.join(active, "_ent")
      .withColumn("_in", insidePred.cast("long"))
      .withColumn("_pin", lag(col("_in"), 1, 0L).over(w))
      .where(col("_in") =!= col("_pin"))
      .select(col("_ent").as("entity"), col("_fid").as("fence_id"),
        col("_tus").as("tus"), col("_in").as("enter"))
  }

  /** CONVOY / co-movement detection [Jeung et al. 2008, bin-quantized] —
    * the SEQUENTIAL extension of [[coLocation]]: a contact is not enough,
    * a convoy is entities that stay together across ≥ `minRun` CONSECUTIVE
    * time bins ("traveled together", not "bumped into each other"). Two
    * entities are together in bin b iff some fix of each, both falling in
    * b, lie within `radiusMicro` (exact int64 d²); a pair's convoys are
    * the maximal runs of consecutive together-bins. Bins an entity is
    * absent from break the run — silence is evidence of separation at this
    * sampling density, which is what distinguishes a convoy from a
    * recurring haunt (same café every morning = many 1-runs, never a
    * convoy).
    *
    * Output per qualifying pair: (ent_a, ent_b, bins_together, max_run)
    * where max_run ≥ minRun.
    *
    * Plan (100 TB posture): per-bin candidates use the [[coLocation]]
    * blocking — b-side keeps its one (cell, bin) key, a-side explodes its
    * Chebyshev ring (SAME bin only; consecutiveness is resolved later, not
    * by a bucket ring), `a.ent < b.ent` orientation — no all-pairs stage;
    * the together-set collapse is one (pair, bin) hash aggregate, and the
    * island window + both run aggregates ride ONE pair exchange (each
    * stage's keys refine the previous partitioning). Exact d² decides;
    * blocking affects cost only.
    */
  def convoyPairs(fixes: DataFrame, entity: Column, tUs: Column,
                  lon: Column, lat: Column, radiusMicro: Long,
                  t0Us: Long, binUs: Long, nBins: Int, minRun: Int,
                  level: Int): DataFrame = {
    require(radiusMicro > 0 && binUs > 0 && nBins >= 1 && minRun >= 1,
      "need positive radius/bin, nBins >= 1, minRun >= 1")
    require(level >= 1 && level <= 16, "level out of range")
    import graft.core.FixedPoint
    val base = fixes.select(entity.cast("long").as("ent"),
        (tUs.cast("long") - t0Us).as("_dt"),
        lon.cast("long").as("lon"), lat.cast("long").as("lat"))
      .where(col("_dt") >= 0L && col("_dt") < binUs * nBins)
      .withColumn("_b", expr(s"_dt div ${binUs}L"))
    val rx = radiusMicro / (FixedPoint.LON_RANGE >> level)
    val ry = radiusMicro / (FixedPoint.LAT_RANGE >> level)
    val rr = (math.max(rx, ry) + 1).toInt
    val cellSide = base.withColumn("_cell",
      graft.functions.GraftFunctions.zcell(col("lon"), col("lat"), level))
    val ringSide = base.withColumn("_cell", explode(
      graft.functions.GraftFunctions.ringCells(col("lon"), col("lat"), level, rr)))
    val ddx = col("b.lon") - col("a.lon")
    val ddy = col("b.lat") - col("a.lat")
    val together = ringSide.as("a").join(cellSide.as("b"),
        col("a._cell") === col("b._cell") && col("a._b") === col("b._b") &&
        col("a.ent") < col("b.ent"))
      .where(ddx * ddx + ddy * ddy <= radiusMicro * radiusMicro)
      .groupBy(col("a.ent").as("ent_a"), col("b.ent").as("ent_b"),
        col("a._b").as("bin"))
      .agg(count(lit(1)).as("_c")).drop("_c")
    val w = Window.partitionBy(col("ent_a"), col("ent_b")).orderBy(col("bin"))
    together
      .withColumn("_isl", col("bin") - row_number().over(w))
      .groupBy("ent_a", "ent_b", "_isl")
      .agg(count(lit(1)).as("_run"))
      .groupBy("ent_a", "ent_b")
      .agg(sum("_run").as("bins_together"), max("_run").as("max_run"))
      .where(col("max_run") >= minRun)
  }

  /** GRID-QUANTIZED trajectory Hausdorff distance — the trajectory
    * SIMILARITY verb (co-travel detection, route matching, movement-pattern
    * clustering): for every pair of entities that ever visited a common
    * grid cell, the symmetric discrete Hausdorff distance between their
    * visited-cell SETS, in squared cell units:
    *   H²(A,B) = max( max_{a∈A} min_{b∈B} d²(a,b),
    *                  max_{b∈B} min_{a∈A} d²(b,a) ).
    *
    * Grid quantization is the SEMANTICS here, not an approximation knob:
    * it bounds per-entity set size by the grid (an entity's footprint in
    * cells), making exact Hausdorff — inherently |A|·|B| per pair —
    * tractable at corpus scale, and it makes every number an
    * engine-invariant int64 (cell indices from one multiply + one integer
    * division on non-negative operands; d² exact).
    *
    * Plan (100 TB posture): the visited-cell table is distinct-collapsed
    * FIRST (one hash aggregate — the only pass over raw fixes) and
    * localCheckpointed once for its three consumers. Candidate pairs come
    * from a cell equi-join (co-visitation blocking — no all-pairs stage);
    * the per-pair cross product is produced by two equi-joins, and BOTH
    * Hausdorff directions ride ONE exchange: each joined row explodes into
    * its two direction keys (pos 0 = a-cell, pos 1 = b-cell), the
    * per-direction min is a map-side-combined hash aggregate (keys collapse
    * from |A|·|B| to |A|+|B| per pair before the shuffle), and the final
    * max-per-direction is a second small aggregate. No window, no sort,
    * no driver structure.
    */
  def gridHausdorff(fixes: DataFrame, entity: Column, lon: Column,
                    lat: Column, level: Int): DataFrame = {
    require(level >= 1 && level <= 16, "level out of range")
    val n = 1L << level
    val cells = fixes.select(entity.cast("long").as("ent"),
        lon.cast("long").as("lon"), lat.cast("long").as("lat"))
      .select(col("ent"),
        expr(s"((lon + 180000000L) * ${n}L) div 360000000L").as("cx"),
        expr(s"((lat + 90000000L) * ${n}L) div 180000000L").as("cy"))
      .distinct()
      .localCheckpoint() // derived once; feeds the pair join + both sides
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
        col("a.ent") < col("b.ent"))
      .select(col("a.ent").as("ea"), col("b.ent").as("eb")).distinct()
    val x = pairs
      .join(cells.select(col("ent").as("ea"),
        col("cx").as("ax"), col("cy").as("ay")), "ea")
      .join(cells.select(col("ent").as("eb"),
        col("cx").as("bx"), col("cy").as("byy")), "eb")
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("byy")) * (col("ay") - col("byy")))
    val sided = x.select(col("ea"), col("eb"), col("d2"),
      posexplode(array(
        struct(col("ax").as("kx"), col("ay").as("ky")),
        struct(col("bx").as("kx"), col("byy").as("ky")))))
    sided.groupBy(col("ea"), col("eb"), col("pos"),
        col("col.kx"), col("col.ky"))
      .agg(min("d2").as("m"))
      .groupBy("ea", "eb")
      .agg(max(when(col("pos") === 0, col("m"))).as("hab"),
           max(when(col("pos") === 1, col("m"))).as("hba"))
      .select(col("ea").as("ent_a"), col("eb").as("ent_b"),
        greatest(col("hab"), col("hba")).as("haus_d2"))
  }

  /** RADIUS OF GYRATION components [González, Hidalgo & Barabási 2008] —
    * THE mobility-range statistic: r_g = √(Σ‖xᵢ − x̄‖²/n) per entity,
    * the size of the territory a mover actually uses (commuter vs
    * traveler separates on r_g where trip counts look identical).
    *
    * Integer-exact surface (floats never cross the engine boundary):
    * coordinates are re-anchored to the entity's own (min lon, min lat)
    * — deviations are bounded by the entity FOOTPRINT, not the world, so
    * Σd² stays far from int64 overflow where raw-coordinate Σx² would
    * not — and the emitted components (entity, n_fixes, sum_dx, sum_dy,
    * sum_d2) reconstruct r_g² = sum_d2/n − (sum_dx/n)² − (sum_dy/n)²
    * exactly (one consumer-side division; the anchor shift cancels
    * algebraically, so the choice of anchor does not affect r_g).
    *
    * Plan (100 TB posture): one entity hash-aggregate for the anchors,
    * one equi-join to re-anchor (both sides partitioned on the same
    * entity key — exchange reuse), one closing hash aggregate. No
    * window, no sort, no driver state.
    */
  def radiusOfGyration(fixes: DataFrame, entity: Column,
                       lon: Column, lat: Column): DataFrame = {
    val f = fixes.select(entity.cast("long").as("ent"),
      lon.cast("long").as("x"), lat.cast("long").as("y"))
    val anchors = f.groupBy("ent")
      .agg(min("x").as("ax"), min("y").as("ay"))
    f.join(anchors, "ent")
      .select(col("ent"), (col("x") - col("ax")).as("dx"),
        (col("y") - col("ay")).as("dy"))
      .groupBy(col("ent").as("entity"))
      .agg(count(lit(1)).as("n_fixes"), sum("dx").as("sum_dx"),
        sum("dy").as("sum_dy"),
        sum(col("dx") * col("dx") + col("dy") * col("dy")).as("sum_d2"))
  }

  /** VISIT CONCENTRATION components [the Song, Qu, Blumm & Barabási 2010
    * predictability question, integer surrogate] — how concentrated is
    * each entity's time across the places it visits: `coll` = Σ nᵢ² over
    * its per-cell visit counts (the Simpson/Rényi-2 surrogate of visit
    * entropy, the [[graft.operators.Multimodal.lumaHistogram]]
    * discipline applied to mobility) plus n_fixes, n_cells and the top
    * cell's count. A commuter (two dominant cells) and an explorer (long
    * uniform tail) separate on coll/n² where raw fix counts look
    * identical; the one float normalization is the consumer's.
    * Complements [[radiusOfGyration]]: r_g measures how FAR the
    * territory spreads, this measures how UNEVENLY it is used.
    *
    * Plan: two chained hash aggregates on refining keys ((entity, cell)
    * → entity — the second groupBy reuses the first exchange's
    * partitioning). No window, no driver state.
    */
  def visitConcentration(fixes: DataFrame, entity: Column,
                         lon: Column, lat: Column, cellMicro: Long)
      : DataFrame = {
    require(cellMicro > 0, "cellMicro must be positive")
    val g = cellMicro
    fixes.select(entity.cast("long").as("ent"),
        (lon.cast("long") + 180000000L).as("wx"),
        (lat.cast("long") + 90000000L).as("wy"))
      .select(col("ent"), expr(s"wx div $g").as("cx"),
        expr(s"wy div $g").as("cy"))
      .groupBy("ent", "cx", "cy").agg(count(lit(1)).as("n"))
      .groupBy(col("ent").as("entity"))
      .agg(sum("n").as("n_fixes"), count(lit(1)).as("n_cells"),
        sum(col("n") * col("n")).as("coll"), max("n").as("max_cell_n"))
  }
}
