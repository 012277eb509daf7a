package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** trips vs a brute single-threaded sessionizer using the SAME fixed IEEE
  * hop chain, plus hand cases for the split rule: gap == gapUs stays in the
  * trip (strictly >), gap + 1 splits, single-fix trips, timestamp ties
  * broken by orderId, and multi-entity isolation.
  */
class TrajectorySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** (entity, tUs, oid, lon, lat) → (entity, trip) -> (n, start, dur, len) */
  private def brute(rows: Seq[(Long, Long, Long, Long, Long)], gapUs: Long)
      : Map[(Long, Long), (Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (ent, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var trip = -1L; var prev: Option[(Long, Long, Long)] = None
      val assigned = sorted.map { case (_, t, _, x, y) =>
        val isNew = prev.forall(p => t - p._1 > gapUs)
        if (isNew) trip += 1
        val hop = if (isNew) 0L else {
          val dx = (x - prev.get._2).toDouble; val dy = (y - prev.get._3).toDouble
          math.floor(math.sqrt(dx * dx + dy * dy)).toLong
        }
        prev = Some((t, x, y))
        (trip, t, hop)
      }
      assigned.groupBy(_._1).map { case (tr, hops) =>
        val ts = hops.map(_._2)
        (ent, tr) -> (hops.size.toLong, ts.min, ts.max - ts.min,
          hops.map(_._3).sum)
      }
    }

  private def run(rows: Seq[(Long, Long, Long, Long, Long)], gapUs: Long)
      : Map[(Long, Long), (Long, Long, Long, Long)] =
    Trajectory.trips(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"), gapUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("split rule: gap == gapUs stays, gap + 1 splits; lengths sum hops") {
    val g = 100L
    val rows = Seq(
      (1L, 0L, 0L, 0L, 0L),
      (1L, 100L, 1L, 30L, 40L),   // gap == g → same trip, hop = 50
      (1L, 201L, 2L, 30L, 40L),   // gap = 101 > g → NEW trip, hop = 0
      (1L, 300L, 3L, 33L, 44L))   // gap = 99 → same trip, hop = 5
    val got = run(rows, g)
    assert(got === Map(
      (1L, 0L) -> (2L, 0L, 100L, 50L),
      (1L, 1L) -> (2L, 201L, 99L, 5L)))
  }

  test("timestamp ties order by orderId; single-fix trips; entity isolation") {
    val g = 10L
    val rows = Seq(
      // entity 2: two fixes at the SAME t — oid 5 precedes oid 7, so the
      // hop is 5→7 (3-4-5 triangle scaled): len 500
      (2L, 1000L, 7L, 300L, 400L),
      (2L, 1000L, 5L, 0L, 0L),
      // entity 3: one isolated fix = its own trip, zero length/duration
      (3L, 50L, 9L, 7L, 7L))
    val got = run(rows, g)
    assert(got === Map(
      (2L, 0L) -> (2L, 1000L, 0L, 500L),
      (3L, 0L) -> (1L, 50L, 0L, 0L)))
  }

  test("brute parity on a pseudo-random multi-entity stream") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 600).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(5000).toLong, i.toLong,
        rnd.nextInt(2000000).toLong - 1000000L,
        rnd.nextInt(2000000).toLong - 1000000L)
    }
    val g = 150L // mixed regime: plenty of splits AND multi-fix trips
    assert(run(rows, g) === brute(rows, g))
  }

  test("odMatrix: brute parity (per-trip first→last cell flows) incl. negative coords and ties") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 600).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(5000).toLong / 10 * 10, i.toLong,
        rnd.nextInt(2000000).toLong - 1000000L,
        rnd.nextInt(2000000).toLong - 1000000L)
    }
    val g = 150L; val cell = 700000L; val shx = 1000000L; val shy = 1000000L
    // brute: sessionize, per trip take first/last by (tus, oid), floor-div cells
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var trips = List.empty[Vector[(Long, Long, Long, Long, Long)]]
      sorted.foreach { r =>
        if (trips.isEmpty || r._2 - trips.head.last._2 > g)
          trips = Vector(r) :: trips
        else trips = (trips.head :+ r) :: trips.tail
      }
      trips.map { t =>
        ((t.head._4 + shx) / cell, (t.head._5 + shy) / cell,
          (t.last._4 + shx) / cell, (t.last._5 + shy) / cell)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Trajectory.odMatrix(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"),
        gapUs = g, cellMicro = cell, lonShift = shx, latShift = shy)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getLong(4))
      .toMap
    assert(got === expect)
    assert(got.values.sum > got.size) // some cell pairs carry multiple flows
  }

  /** coLocation vs brute all-pairs: same exact int64 predicates, no grid. */
  private def bruteContacts(rows: Seq[(Long, Long, Long, Long)],
                            r: Long, tau: Long): Map[(Long, Long), Long] = {
    val pairs = for {
      i <- rows.indices; j <- rows.indices
      a = rows(i); b = rows(j)
      if a._1 < b._1 && math.abs(a._2 - b._2) <= tau &&
        (b._3 - a._3) * (b._3 - a._3) + (b._4 - a._4) * (b._4 - a._4) <= r * r
    } yield (a._1, b._1)
    pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def runCo(rows: Seq[(Long, Long, Long, Long)], r: Long, tau: Long,
                    level: Int): Map[(Long, Long), Long] =
    Trajectory.coLocation(rows.toDF("ent", "tus", "lon", "lat"),
        col("ent"), col("tus"), col("lon"), col("lat"), r, tau, level)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap

  test("coLocation: boundary inclusion, orientation, self-pair exclusion") {
    val r = 500L; val tau = 100L
    val rows = Seq(
      (1L, 0L, 0L, 0L),
      (2L, 100L, 300L, 400L),  // d = 500 == r (closed), Δt = 100 == τ (closed)
      (2L, 201L, 300L, 400L),  // Δt = 201 > τ vs ent 1 → no contact
      (3L, 0L, 301L, 400L),    // d² = 301²+400² > r² vs ent 1 → no contact
      (1L, 0L, 1L, 1L))        // same entity as row 0 → never paired
    val got = runCo(rows, r, tau, 12)
    // (1,2): both ent-1 fixes reach ent-2's t=100 fix — (0,0): d² exactly
    //   r², Δt exactly τ, both closed → in; (1,1): 299²+399² = 248602 → in;
    //   the t=201 fix fails the time gate against both. → 2
    // (1,3): (0,0) vs (301,400): 250601 > r² → out; (1,1): 249201 → in. → 1
    // (2,3): only the t=100 fix passes the time gate; d² = 1 → in. → 1
    assert(got === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("coLocation: brute parity incl. negative times/coords across τ-bucket and cell seams") {
    val rnd = new scala.util.Random(44)
    val rows = (0 until 500).map { i =>
      ((i % 9).toLong, rnd.nextInt(4000).toLong - 2000L,
        rnd.nextInt(3000000).toLong - 1500000L,
        rnd.nextInt(3000000).toLong - 1500000L)
    }
    val r = 400000L; val tau = 300L
    val expect = bruteContacts(rows, r, tau)
    for (level <- Seq(8, 11)) // coarse AND fine grids — blocking never bites
      assert(runCo(rows, r, tau, level) === expect, s"level $level")
    assert(expect.values.sum > expect.size) // multi-contact pairs exercised
  }

  /** gridHausdorff vs a brute in-JVM reference over the SAME quantized
    * cell sets (integer div on non-negative lon+180e6 — floor). */
  private def bruteHaus(rows: Seq[(Long, Long, Long)], level: Int)
      : Map[(Long, Long), Long] = {
    val n = 1L << level
    val cells = rows.map { case (e, lon, lat) =>
      (e, ((lon + 180000000L) * n) / 360000000L,
        ((lat + 90000000L) * n) / 180000000L)
    }.distinct.groupBy(_._1).view
      .mapValues(_.map(c => (c._2, c._3)).toSet).toMap
    def h(a: Set[(Long, Long)], b: Set[(Long, Long)]): Long =
      a.map(p => b.map(q =>
        (p._1 - q._1) * (p._1 - q._1) + (p._2 - q._2) * (p._2 - q._2)).min).max
    val ents = cells.keys.toSeq.sorted
    (for {
      i <- ents.indices; j <- (i + 1) until ents.size
      a = cells(ents(i)); b = cells(ents(j))
      if a.intersect(b).nonEmpty // co-visitation blocking IS the semantics
    } yield (ents(i), ents(j)) -> math.max(h(a, b), h(b, a))).toMap
  }

  test("gridHausdorff: hand case — asymmetric footprints share one cell") {
    // level 4: cells are 22.5e6 × 11.25e6 µdeg. A visits cells (8,8) and
    // (11,8); B visits (8,8) only. h(A→B) = max(0, 9) = 9; h(B→A) = 0.
    // C is far away, shares nothing → no row for (A,C)/(B,C).
    val rows = Seq(
      (1L, 1000000L, 1000000L),   // A → cell (8,8)
      (1L, 70000000L, 1000000L),  // A → cell (11,8)
      (2L, 2000000L, 2000000L),   // B → cell (8,8)
      (3L, -150000000L, -80000000L)) // C → far cell
    val got = Trajectory.gridHausdorff(rows.toDF("ent", "lon", "lat"),
        col("ent"), col("lon"), col("lat"), 4)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 9L))
  }

  test("gridHausdorff: brute parity on clustered multi-entity footprints") {
    val rnd = new scala.util.Random(45)
    val rows = (0 until 800).map { i =>
      val hub = (i % 11).toLong % 4L // 4 hubs → shared cells within a hub
      (i % 11L,
        hub * 40000000L - 60000000L + rnd.nextInt(3000000).toLong,
        hub * 20000000L - 30000000L + rnd.nextInt(3000000).toLong)
    }
    for (level <- Seq(7, 10))
      assert(Trajectory.gridHausdorff(rows.toDF("ent", "lon", "lat"),
          col("ent"), col("lon"), col("lat"), level)
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
        === bruteHaus(rows, level), s"level $level")
  }

  // ---- stayPoints ----

  private def runStays(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                       minStay: Long, minFix: Long)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Trajectory.stayPoints(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"),
        g, minStay, minFix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
  }

  private def bruteStays(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                         minStay: Long, minFix: Long)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (ent, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
        .map(e => (e._2, (e._4 + 180000000L) / g, (e._5 + 90000000L) / g))
      // split into maximal same-cell runs
      val runs = sorted.foldLeft(List.empty[List[(Long, Long, Long)]]) {
        case (acc, f) => acc match {
          case h :: t if h.head._2 == f._2 && h.head._3 == f._3 => (f :: h) :: t
          case _ => List(f) :: acc
        }
      }
      runs.filter(r => r.map(_._1).max - r.map(_._1).min >= minStay
          && r.size >= minFix)
        .map(r => (ent, r.head._2, r.head._3, r.map(_._1).min,
          r.map(_._1).max, r.size.toLong))
    }.toSet

  test("stayPoints: dwell gates, run break on a single far fix, revisit = new stay") {
    val g = 1000000L
    def f(ent: Long, t: Long, oid: Long, cellX: Long, cellY: Long) =
      (ent, t, oid, cellX * g - 180000000L + g / 2, cellY * g - 90000000L + g / 2)
    val rows = Seq(
      // entity 1: dwell in (5,5) for 3 fixes / 200 µs, ONE far fix breaks it,
      // then revisit (5,5) → a SECOND stay point
      f(1, 100, 1, 5, 5), f(1, 200, 2, 5, 5), f(1, 300, 3, 5, 5),
      f(1, 400, 4, 9, 9),
      f(1, 500, 5, 5, 5), f(1, 650, 6, 5, 5), f(1, 800, 7, 5, 5),
      // entity 2: long enough but only 2 fixes → minFixes gate drops it
      f(2, 100, 1, 7, 7), f(2, 900, 2, 7, 7),
      // entity 2: 3 fixes but duration 199 < 200 → minStay gate drops it
      f(2, 1000, 3, 8, 8), f(2, 1100, 4, 8, 8), f(2, 1199, 5, 8, 8))
    val got = runStays(rows, g, minStay = 200L, minFix = 3L)
    assert(got === Set((1L, 5L, 5L, 100L, 300L, 3L), (1L, 5L, 5L, 500L, 800L, 3L)))
    assert(got === bruteStays(rows, g, 200L, 3L))
    // exactly-at-threshold duration (300-100 = 200 = minStay) is INCLUDED
    assert(got.exists(_._4 === 100L))
  }

  // ---- nextCellEval ----

  private def runEval(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                      pm: Int): (Long, Long) = {
    import spark.implicits._
    val r = Trajectory.nextCellEval(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"), g, pm)
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  private def bruteEval(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                        pm: Int): (Long, Long) = {
    val seqs = rows.groupBy(_._1).view.mapValues { evs =>
      evs.sortBy(e => (e._2, e._3))
        .map(e => ((e._4 + 180000000L) / g, (e._5 + 90000000L) / g))
        .foldLeft(List.empty[(Long, Long)]) {
          case (acc, c) if acc.headOption.contains(c) => acc
          case (acc, c) => c :: acc
        }.reverse.toVector
    }.toMap
    val labeled = seqs.values.toSeq.flatMap { v =>
      val cut = v.length.toLong * pm / 1000
      (1 until v.length).map(i => (v(i - 1), v(i), (i + 1).toLong <= cut))
    }
    val model = labeled.filter(_._3).groupBy(t => (t._1, t._2))
      .map { case (k, g0) => k -> g0.size.toLong }
      .groupBy(_._1._1).map { case (from, tos) =>
        from -> tos.toSeq.map { case ((_, to), c) => (-c, to) }.min._2
      }
    val test = labeled.filterNot(_._3)
    (test.size.toLong,
      test.count(t => model.get(t._1).contains(t._2)).toLong)
  }

  test("nextCellEval: alternation predicts, unseen from-cell is a miss, ties to min cell") {
    val g = 1000000L
    def f(ent: Long, t: Long, px: Long, py: Long) =
      (ent, t, t, px * g - 180000000L + g / 2, py * g - 90000000L + g / 2)
    def walk(ent: Long, cells: Seq[(Long, Long)]) =
      cells.zipWithIndex.map { case ((x, y), i) => f(ent, i + 1L, x, y) }
    val A = (10L, 10L); val B = (20L, 20L); val C = (30L, 30L)
    val D = (40L, 40L); val E = (50L, 50L)
    val F = (60L, 60L); val G = (70L, 70L); val H = (80L, 80L)
    val rows =
      walk(1, Seq(A, B, A, B, A, B, A, B, A, B)) ++ // test i=8,9,10: 3 hits
      walk(2, Seq(C, D, E)) ++                      // test D→E: D unseen, miss
      walk(3, Seq(F, G, F, H, F, G))                // F ties G/H → G; 1 of 2
    assert(runEval(rows, g, 700) === ((6L, 4L)))
    assert(bruteEval(rows, g, 700) === ((6L, 4L)))
  }

  test("nextCellEval: brute parity on the jittered slotted stream across splits") {
    val rnd = new scala.util.Random(101)
    val rows = (0 until 8).flatMap { e =>
      var t = 0L
      (0 until 150).map { i =>
        t += rnd.nextLong(1000L) + 1L
        val slot = i / 10
        (e.toLong, t, i.toLong,
          (e % 3) * 10000000L + (slot % 4) * 2000000L + rnd.nextLong(600001L) - 300000L,
          (e % 3) * 8000000L + (slot % 4) * 1500000L + rnd.nextLong(600001L) - 300000L)
      }
    }
    for (pm <- Seq(500, 700, 900))
      assert(runEval(rows, 1000000L, pm) === bruteEval(rows, 1000000L, pm), s"pm=$pm")
  }

  // ---- gridFrechet ----

  private def runFrechet(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                         cap: Int): Map[(Long, Long), Long] = {
    import spark.implicits._
    Trajectory.gridFrechet(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"), g, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def bruteFrechet(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                           cap: Int): Map[(Long, Long), Long] = {
    val seqs = rows.groupBy(_._1).view.mapValues { evs =>
      val cells = evs.sortBy(e => (e._2, e._3))
        .map(e => ((e._4 + 180000000L) / g, (e._5 + 90000000L) / g))
      cells.foldLeft(List.empty[(Long, Long)]) {
        case (acc, c) if acc.headOption.contains(c) => acc
        case (acc, c) => c :: acc
      }.reverse.toArray
    }.filter(_._2.length <= cap).toMap
    def fd(a: Array[(Long, Long)], b: Array[(Long, Long)]): Long = {
      val f = Array.ofDim[Long](a.length, b.length)
      for (i <- a.indices; j <- b.indices) {
        val dx = a(i)._1 - b(j)._1; val dy = a(i)._2 - b(j)._2
        val d = dx * dx + dy * dy
        val best =
          if (i == 0 && j == 0) 0L
          else if (i == 0) f(0)(j - 1)
          else if (j == 0) f(i - 1)(0)
          else math.min(math.min(f(i - 1)(j), f(i)(j - 1)), f(i - 1)(j - 1))
        f(i)(j) = math.max(d, best)
      }
      f(a.length - 1)(b.length - 1)
    }
    (for {
      (ea, sa) <- seqs.toSeq; (eb, sb) <- seqs.toSeq
      if ea < eb && sa.toSet.intersect(sb.toSet).nonEmpty
    } yield (ea, eb) -> fd(sa, sb)).toMap
  }

  test("gridFrechet: order-aware — opposite loops are Hausdorff-0 but Fréchet-far") {
    val g = 1000000L
    def f(ent: Long, t: Long, px: Long, py: Long) =
      (ent, t, t, px * g - 180000000L + g / 2, py * g - 90000000L + g / 2)
    // X = (10,10), Y = (20,10): ent 1 walks X→Y, ent 2 walks Y→X.
    // SAME visited set, so gridHausdorff = 0; discrete Fréchet = d(X,Y)².
    val rows = Seq(f(1, 1, 10, 10), f(1, 2, 20, 10),
      f(2, 1, 20, 10), f(2, 2, 10, 10),
      // ent 3 walks X→Y like ent 1 (with a duplicate fix): distance 0
      f(3, 1, 10, 10), f(3, 2, 10, 10), f(3, 3, 20, 10))
    val got = runFrechet(rows, g, cap = 64)
    assert(got === Map((1L, 2L) -> 100L, (1L, 3L) -> 0L, (2L, 3L) -> 100L))
    assert(got === bruteFrechet(rows, g, 64))
    val haus = Trajectory.gridHausdorff(
      { import spark.implicits._
        rows.map(r => (r._1, r._4, r._5)).toDF("ent", "lon", "lat") },
      col("ent"), col("lon"), col("lat"), level = 16)
    assert(haus.collect().forall(_.getLong(2) === 0L),
      "the same fixture must be Hausdorff-identical")
    // cap = 1 keeps only... every entity has 2 visits → all excluded
    assert(runFrechet(rows, g, 1) === Map.empty)
  }

  test("gridFrechet: brute parity on hub-hopping slotted entities") {
    val rnd = new scala.util.Random(73)
    val rows = (0 until 24).flatMap { e =>
      (0 until 10).map { slot =>
        val hub = (e % 4 + slot * (1 + e % 3)) % 5
        (e.toLong, slot * 100L + 5L, slot.toLong,
          hub * 10000000L - 20000000L, hub * 8000000L - 15000000L)
      }
    }
    for (cap <- Seq(5, 12, 64))
      assert(runFrechet(rows, 1000000L, cap)
        === bruteFrechet(rows, 1000000L, cap), s"cap=$cap")
  }

  // ---- placeCoVisits ----

  private def runCoVisits(rows: Seq[(Long, Long, Long)], g: Long, cap: Int)
      : Map[(Long, Long, Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    Trajectory.placeCoVisits(rows.toDF("ent", "lon", "lat"), col("ent"),
        col("lon"), col("lat"), g, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)) -> ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
  }

  private def bruteCoVisits(rows: Seq[(Long, Long, Long)], g: Long, cap: Int)
      : Map[(Long, Long, Long, Long), (Long, Long, Long)] = {
    val K = 1073741824L
    val sets = rows.groupBy(_._1).view.mapValues(_.map(e =>
        ((e._2 + 180000000L) / g) * K + (e._3 + 90000000L) / g).toSet)
      .filter(_._2.size <= cap).toMap
    val cellN = sets.values.flatten.groupBy(identity).map {
      case (c, v) => c -> v.size.toLong }
    sets.values.flatMap(s => for (a <- s; b <- s if a < b) yield (a, b))
      .groupBy(identity).map { case ((a, b), v) =>
        (a / K, a % K, b / K, b % K) ->
          ((v.size.toLong, cellN(a), cellN(b))) }
  }

  test("placeCoVisits: common-visitor counts, footprint cap excludes, kept universe") {
    val g = 1000000L
    def at(px: Long, py: Long): (Long, Long) =
      (px * g - 180000000L + g / 2, py * g - 90000000L + g / 2)
    val A = at(10, 10); val B = at(11, 11); val C = at(12, 12)
    def f(ent: Long, c: (Long, Long)) = (ent, c._1, c._2)
    val rows = Seq(f(1, A), f(1, B), f(1, A), // duplicate visit collapses
      f(2, A), f(2, B), f(2, C),
      f(3, B), f(3, C),
      // entity 4: footprint 5 > cap 4 → excluded from pairs AND counts
      f(4, A), f(4, B), f(4, C), f(4, at(20, 20)), f(4, at(21, 21)))
    val got = runCoVisits(rows, g, cap = 4)
    assert(got === Map(
      (10L, 10L, 11L, 11L) -> ((2L, 2L, 3L)),
      (10L, 10L, 12L, 12L) -> ((1L, 2L, 2L)),
      (11L, 11L, 12L, 12L) -> ((2L, 3L, 2L))))
    assert(got === bruteCoVisits(rows, g, 4))
    // raising the cap admits entity 4 everywhere
    assert(runCoVisits(rows, g, 5) === bruteCoVisits(rows, g, 5))
  }

  test("placeCoVisits: brute parity on hub-hopping entities") {
    val rnd = new scala.util.Random(67)
    val rows = (0 until 30).flatMap { e =>
      (0 until 20).map { _ =>
        val hub = rnd.nextInt(4)
        (e.toLong,
          hub * 20000000L - 40000000L + rnd.nextLong(3000001L) - 1500000L,
          hub * 15000000L - 30000000L + rnd.nextLong(3000001L) - 1500000L)
      }
    }
    for (cap <- Seq(3, 8, 100))
      assert(runCoVisits(rows, 1000000L, cap)
        === bruteCoVisits(rows, 1000000L, cap), s"cap=$cap")
  }

  // ---- anchorCells ----

  private def runAnchors(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                         k: Int): Set[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Trajectory.anchorCells(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"), g, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
  }

  private def bruteAnchors(rows: Seq[(Long, Long, Long, Long, Long)], g: Long,
                           k: Int): Set[(Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (ent, evs) =>
      val s = evs.sortBy(e => (e._2, e._3))
        .map(e => (e._2, (e._4 + 180000000L) / g, (e._5 + 90000000L) / g))
      val runs = s.foldLeft(List.empty[List[(Long, Long, Long)]]) {
        case (h :: t, f) if h.head._2 == f._2 && h.head._3 == f._3 => (f :: h) :: t
        case (acc, f) => List(f) :: acc
      }
      val perCell = runs.groupBy(r => (r.head._2, r.head._3)).map {
        case (c, rs) => (c, rs.map(r => r.map(_._1).max - r.map(_._1).min).sum,
          rs.map(_.size).sum.toLong)
      }
      perCell.toSeq.sortBy { case ((cx, cy), dw, n) => (-dw, -n, cx, cy) }
        .take(k).zipWithIndex.map { case (((cx, cy), dw, n), i) =>
          (ent, i + 1L, cx, cy, dw, n) }
    }.toSet

  test("anchorCells: dwell beats ping count; deterministic ties; single-fix runs") {
    val g = 1000000L
    def f(ent: Long, t: Long, px: Long, py: Long) =
      (ent, t, t, px * g - 180000000L + g / 2, py * g - 90000000L + g / 2)
    val rows = Seq(
      // cell A: ONE long run t 0..1000 (2 fixes, dwell 1000)
      f(1, 0, 5, 5), f(1, 1000, 5, 5),
      // cell B: 4 passing pings, each its own run (dwell 0, 4 fixes)
      f(1, 2000, 6, 6), f(1, 3000, 5, 5), f(1, 4000, 6, 6), f(1, 5000, 5, 5),
      f(1, 6000, 6, 6), f(1, 7000, 5, 5), f(1, 8000, 6, 6))
    // cell A dwell = 1000 (first run) + 0×4 single-fix revisits; B dwell 0
    val got = runAnchors(rows, g, 2)
    assert(got === Set((1L, 1L, 5L, 5L, 1000L, 5L), (1L, 2L, 6L, 6L, 0L, 4L)))
    assert(got === bruteAnchors(rows, g, 2))
    // pure tie (two cells, one single-fix run each): (cx, cy) breaks it
    val tie = Seq(f(2, 10, 9, 9), f(2, 20, 3, 3))
    assert(runAnchors(tie, g, 1) === Set((2L, 1L, 3L, 3L, 0L, 1L)))
  }

  test("anchorCells: brute parity on the jittered slotted stream") {
    val rnd = new scala.util.Random(59)
    val rows = (0 until 6).flatMap { e =>
      var t = 0L
      (0 until 200).map { i =>
        t += rnd.nextLong(1000L) + 1L
        val slot = i / 15
        (e.toLong, t, i.toLong,
          e * 10000000L + slot * 997000L + rnd.nextLong(600001L) - 300000L,
          e * 8000000L + slot * 1009000L + rnd.nextLong(600001L) - 300000L)
      }
    }
    for (k <- Seq(1, 3, 10))
      assert(runAnchors(rows, 1000000L, k) === bruteAnchors(rows, 1000000L, k), s"k=$k")
  }

  // ---- flagTeleports ----

  private def runTele(rows: Seq[(Long, Long, Long, Long, Long)], vmax: Long)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Trajectory.flagTeleports(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"), vmax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  private def bruteTele(rows: Seq[(Long, Long, Long, Long, Long)], vmax: Long)
      : Set[(Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (ent, evs) =>
      val s = evs.sortBy(e => (e._2, e._3))
      s.zip(s.drop(1)).flatMap { case (p, f) =>
        val dx = (f._4 - p._4).toDouble; val dy = (f._5 - p._5).toDouble
        val hop = math.floor(math.sqrt(dx * dx + dy * dy)).toLong
        val dt = f._2 - p._2
        if (hop * 1000000L > vmax * dt) Some((ent, f._2, f._3, hop, dt))
        else None
      }
    }.toSet

  test("flagTeleports: threshold-exact, zero-dt flags, first fix never flags") {
    // vmax = 100 µdeg/s: hop 3600, dt 36s → speed exactly 100 → NOT flagged
    // (strict >); hop 3601 flags; dt 0 with hop 5 flags (infinite speed)
    val rows = Seq(
      (1L, 0L, 1L, 0L, 0L),
      (1L, 36000000L, 2L, 3600L, 0L),            // exactly at vmax: clean
      (1L, 72000000L, 3L, 3600L + 3601L, 0L),    // 3601 over 36s: flag
      (1L, 72000000L, 4L, 3600L + 3601L + 5L, 0L), // same ts, moved: flag
      (2L, 0L, 5L, 90000000L, 0L))               // first fix: never flags
    val got = runTele(rows, 100L)
    assert(got === Set((1L, 72000000L, 3L, 3601L, 36000000L),
      (1L, 72000000L, 4L, 5L, 0L)))
    assert(got === bruteTele(rows, 100L))
  }

  test("flagTeleports: brute parity on the jittered stream across thresholds") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 6).flatMap { e =>
      var t = 0L
      (0 until 300).map { i =>
        t += rnd.nextLong(5000000L)
        (e.toLong, t, i.toLong, rnd.nextLong(2000001L) - 1000000L,
          rnd.nextLong(2000001L) - 1000000L)
      }
    }
    for (vmax <- Seq(1L, 100L, 100000L)) {
      val got = runTele(rows, vmax)
      assert(got === bruteTele(rows, vmax), s"vmax=$vmax")
    }
    assert(runTele(rows, 1L).nonEmpty &&
      runTele(rows, 100000L).size < runTele(rows, 1L).size)
  }

  // ---- cellTransitions ----

  private def runTrans(rows: Seq[(Long, Long, Long, Long, Long)], g: Long)
      : Map[(Long, Long, Long, Long), Long] = {
    import spark.implicits._
    Trajectory.cellTransitions(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"), g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)) -> r.getLong(4)).toMap
  }

  private def bruteTrans(rows: Seq[(Long, Long, Long, Long, Long)], g: Long)
      : Map[(Long, Long, Long, Long), Long] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val cells = evs.sortBy(e => (e._2, e._3))
        .map(e => ((e._4 + 180000000L) / g, (e._5 + 90000000L) / g))
      val visits = cells.foldLeft(List.empty[(Long, Long)]) {
        case (acc, c) if acc.headOption.contains(c) => acc
        case (acc, c) => c :: acc
      }.reverse
      visits.zip(visits.drop(1))
        .map { case ((fa, fb), (ta, tb)) => (fa, fb, ta, tb) }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("cellTransitions: run collapse, revisit edges, no self-loops") {
    val g = 1000000L
    def f(ent: Long, t: Long, px: Long, py: Long) =
      (ent, t, t, px * g - 180000000L + g / 2, py * g - 90000000L + g / 2)
    // entity 1 path: c1 c1 c2 c1 c3 → visits c1,c2,c1,c3
    // entity 2 path: c1 c2 — adds a second c1→c2 edge
    val rows = Seq(f(1, 1, 5, 5), f(1, 2, 5, 5), f(1, 3, 6, 5),
      f(1, 4, 5, 5), f(1, 5, 7, 7), f(2, 1, 5, 5), f(2, 2, 6, 5))
    val got = runTrans(rows, g)
    assert(got === Map((5L, 5L, 6L, 5L) -> 2L, (6L, 5L, 5L, 5L) -> 1L,
      (5L, 5L, 7L, 7L) -> 1L))
    assert(got === bruteTrans(rows, g))
    assert(got.keys.forall { case (a, b, c, d) => (a, b) != (c, d) }, "no self-loops")
  }

  test("cellTransitions: brute parity on the jittered slotted stream") {
    val rnd = new scala.util.Random(47)
    val rows = (0 until 6).flatMap { e =>
      var t = 0L
      (0 until 200).map { i =>
        t += rnd.nextLong(3L)
        val slot = i / 15
        (e.toLong, t, i.toLong,
          e * 10000000L + slot * 997000L + rnd.nextLong(600001L) - 300000L,
          e * 8000000L + slot * 1009000L + rnd.nextLong(600001L) - 300000L)
      }
    }
    assert(runTrans(rows, 1000000L) === bruteTrans(rows, 1000000L))
  }

  // ---- geofenceEvents ----

  private val testFences = Seq(
    (1L, 10000000L, 10000000L, 20000000L, 20000000L),
    (2L, 15000000L, 15000000L, 30000000L, 25000000L), // overlaps fence 1
    (3L, -50000000L, -50000000L, -40000000L, -45000000L))

  private def runFence(rows: Seq[(Long, Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Trajectory.geofenceEvents(rows.toDF("ent", "tus", "oid", "lon", "lat"),
        col("ent"), col("tus"), col("oid"), col("lon"), col("lat"),
        testFences.toDF("fence_id", "lon_min", "lat_min", "lon_max", "lat_max"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
  }

  private def bruteFence(rows: Seq[(Long, Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] =
    (for {
      (fid, lo, la, hi, ha) <- testFences
      (ent, evs) <- rows.groupBy(_._1)
      sorted = evs.sortBy(e => (e._2, e._3))
      flags = sorted.map(e =>
        (e._2, if (e._4 >= lo && e._4 <= hi && e._5 >= la && e._5 <= ha) 1L else 0L))
      ((tus, in), i) <- flags.zipWithIndex
      if in != (if (i == 0) 0L else flags(i - 1)._2)
    } yield (ent, fid, tus, in)).toSet

  test("geofenceEvents: crossings incl. boundary-inclusive edges; first-fix rules") {
    val rows = Seq(
      // entity 1: outside → ON the fence-1 corner (inclusive=enter) → deep in
      // both 1 and 2 → out of everything → back into 2
      (1L, 100L, 1L, 0L, 0L),
      (1L, 200L, 2L, 10000000L, 10000000L),          // enter 1 (boundary)
      (1L, 300L, 3L, 18000000L, 18000000L),          // enter 2, still in 1
      (1L, 400L, 4L, 90000000L, 0L),                 // exit 1 AND 2
      (1L, 500L, 5L, 29000000L, 24000000L),          // enter 2 only
      // entity 2: FIRST fix already inside fence 1 → enter at first fix
      (2L, 50L, 6L, 15000000L, 15000000L))
    val got = runFence(rows)
    assert(got === Set(
      (1L, 1L, 200L, 1L), (1L, 1L, 400L, 0L),
      (1L, 2L, 300L, 1L), (1L, 2L, 400L, 0L), (1L, 2L, 500L, 1L),
      (2L, 1L, 50L, 1L), (2L, 2L, 50L, 1L)))
    assert(got === bruteFence(rows))
  }

  test("geofenceEvents: brute parity on a random walk with timestamp ties") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 6).flatMap { e =>
      var (x, y) = (rnd.nextLong(60000001L) - 30000000L,
        rnd.nextLong(60000001L) - 30000000L)
      (0 until 150).map { i =>
        x += rnd.nextLong(8000001L) - 4000000L
        y += rnd.nextLong(8000001L) - 4000000L
        (e.toLong, (i / 3).toLong, i.toLong, x, y) // ties every 3 fixes
      }
    }
    assert(runFence(rows) === bruteFence(rows))
    assert(runFence(rows).nonEmpty, "walk must cross fences")
  }

  // ---- convoyPairs ----

  private def runConvoys(rows: Seq[(Long, Long, Long, Long)], r: Long,
                         binUs: Long, nBins: Int, minRun: Int, level: Int)
      : Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Trajectory.convoyPairs(rows.toDF("ent", "tus", "lon", "lat"),
        col("ent"), col("tus"), col("lon"), col("lat"), r,
        t0Us = 0L, binUs = binUs, nBins = nBins, minRun = minRun, level = level)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSet
  }

  private def bruteConvoys(rows: Seq[(Long, Long, Long, Long)], r: Long,
                           binUs: Long, nBins: Int, minRun: Int)
      : Set[(Long, Long, Long, Long)] = {
    val evs = rows.filter(e => e._2 >= 0 && e._2 < binUs * nBins)
      .map(e => (e._1, e._2 / binUs, e._3, e._4))
    val together = (for {
      a <- evs; b <- evs
      if a._1 < b._1 && a._2 == b._2
      dx = b._3 - a._3; dy = b._4 - a._4
      if dx * dx + dy * dy <= r * r
    } yield ((a._1, b._1), a._2)).distinct.groupBy(_._1)
    together.flatMap { case ((ea, eb), bs) =>
      val bins = bs.map(_._2).distinct.sorted
      val runs = bins.foldLeft(List.empty[List[Long]]) {
        case (h :: t, b) if b == h.head + 1 => (b :: h) :: t
        case (acc, b) => List(b) :: acc
      }.map(_.size.toLong)
      if (runs.max >= minRun) Some((ea, eb, bins.size.toLong, runs.max))
      else None
    }.toSet
  }

  test("convoyPairs: consecutive-run gate; absence breaks runs; revisits don't") {
    val B = 1000L
    def at(ent: Long, bin: Long, lon: Long, lat: Long) =
      (ent, bin * B + 5L, lon, lat)
    val hub = (20000000L, 10000000L); val far = (90000000L, -40000000L)
    val rows = Seq(
      // A(1) & B(2): together bins 1,2,3 then 6,7 → max_run 3, 5 together
      at(1, 1, hub._1, hub._2), at(2, 1, hub._1 + 50, hub._2),
      at(1, 2, hub._1, hub._2), at(2, 2, hub._1, hub._2 + 50),
      at(1, 3, hub._1 + 30, hub._2), at(2, 3, hub._1, hub._2),
      at(1, 4, far._1, far._2), at(2, 4, hub._1, hub._2), // apart in 4
      at(1, 6, hub._1, hub._2), at(2, 6, hub._1 + 10, hub._2),
      at(1, 7, hub._1, hub._2), at(2, 7, hub._1, hub._2 + 10),
      // A(1) & C(3): together 0 and 2,3 — C ABSENT in bin 1 → runs 1, 2
      at(3, 0, hub._1, hub._2), at(1, 0, hub._1 + 20, hub._2),
      at(3, 2, hub._1 + 40, hub._2), at(3, 3, hub._1, hub._2 + 40))
    val got = runConvoys(rows, r = 100L, binUs = B, nBins = 10,
      minRun = 3, level = 12)
    assert(got === Set((1L, 2L, 5L, 3L)))
    assert(got === bruteConvoys(rows, 100L, B, 10, 3))
    // minRun = 2 admits A-C (runs 1,2) and B-C (incidental 2-run in bins 2,3)
    val lo = runConvoys(rows, 100L, B, 10, 2, 12)
    assert(lo === Set((1L, 2L, 5L, 3L), (1L, 3L, 3L, 2L), (2L, 3L, 2L, 2L)))
    assert(lo === bruteConvoys(rows, 100L, B, 10, 2))
  }

  test("convoyPairs: brute parity on hub-jittered entities across two levels") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 40).flatMap { e =>
      val hub = e % 5
      (0 until 12).flatMap { b =>
        if (rnd.nextInt(10) < 7) Some((e.toLong, b * 1000L + rnd.nextLong(1000L),
          hub * 30000000L - 60000000L + rnd.nextLong(400001L) - 200000L,
          hub * 20000000L - 40000000L + rnd.nextLong(400001L) - 200000L))
        else None // random absences → genuine run breaks
      }
    }
    for (level <- Seq(9, 12); minRun <- Seq(2, 4))
      assert(runConvoys(rows, 250000L, 1000L, 12, minRun, level)
        === bruteConvoys(rows, 250000L, 1000L, 12, minRun), s"$level/$minRun")
  }

  test("stayPoints: brute parity on a jittered multi-entity stream with ties") {
    val rnd = new scala.util.Random(37)
    val rows = (0 until 5).flatMap { e =>
      var t = 0L
      (0 until 200).map { i =>
        t += rnd.nextLong(3L) // frequent timestamp TIES → oid must decide
        val slot = i / 20
        (e.toLong, t, i.toLong,
          e * 10000000L + slot * 997000L + rnd.nextLong(600001L) - 300000L,
          e * 8000000L + slot * 1009000L + rnd.nextLong(600001L) - 300000L)
      }
    }
    for (minStay <- Seq(0L, 5L, 20L); minFix <- Seq(1L, 3L))
      assert(runStays(rows, 1000000L, minStay, minFix)
        === bruteStays(rows, 1000000L, minStay, minFix), s"$minStay/$minFix")
  }

  // ---- radiusOfGyration --------------------------------------------------

  test("radiusOfGyration: components match a hand computation and are anchor-invariant") {
    import spark.implicits._
    // entity 1: fixes at (0,0), (10,0), (0,10), (10,10) — mean (5,5),
    // rg^2 = 50/4... components vs min-anchor (0,0): sum_dx=20, sum_dy=20,
    // sum_d2 = 0+100+100+200 = 400; entity 2: single fix -> all zero
    val fixes = Seq(
      (1L, 0L, 0L), (1L, 10L, 0L), (1L, 0L, 10L), (1L, 10L, 10L),
      (2L, 777L, -333L))
    val got = Trajectory.radiusOfGyration(fixes.toDF("ent", "x", "y"),
        col("ent"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(1L -> ((4L, 20L, 20L, 400L)),
      2L -> ((1L, 0L, 0L, 0L))))
    // rg^2 reconstructs exactly: 400/4 - (20/4)^2 - (20/4)^2 = 100-25-25=50
    val (n, sdx, sdy, sd2) = got(1L)
    assert(sd2.toDouble / n - math.pow(sdx.toDouble / n, 2)
      - math.pow(sdy.toDouble / n, 2) === 50.0)
    // anchor invariance: shifting every fix by a constant changes nothing
    val shifted = fixes.map { case (e, x, y) => (e, x + 100000L, y - 50000L) }
    val got2 = Trajectory.radiusOfGyration(shifted.toDF("ent", "x", "y"),
        col("ent"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got2 === got)
  }

  test("visitConcentration: commuter vs explorer separate on coll; hand counts exact") {
    import spark.implicits._
    val g = 1000000L
    def at(cx: Long, cy: Long) = (cx * g - 180000000L + 5L, cy * g - 90000000L + 5L)
    // commuter (ent 1): 8 fixes in 2 cells (6 + 2); explorer (ent 2):
    // 8 fixes in 8 distinct cells
    val home = at(10, 10); val work = at(20, 20)
    val fx = (Seq.fill(6)((1L, home._1, home._2)) ++
      Seq.fill(2)((1L, work._1, work._2)) ++
      (0 until 8).map(i => (2L, at(40 + i, 40)._1, at(40 + i, 40)._2)))
    val got = Trajectory.visitConcentration(fx.toDF("ent", "x", "y"),
        col("ent"), col("x"), col("y"), g)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(1L -> ((8L, 2L, 40L, 6L)), 2L -> ((8L, 8L, 8L, 1L))))
    // same n_fixes, wildly different concentration: 40 vs 8
  }
}
