package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid DBSCAN vs an in-JVM brute-force reference of the same
  * deterministic rule set (min-label clusters, min-core-neighbor borders).
  */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** Brute-force reference: quadratic neighbors, BFS components. */
  private def brute(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int): Map[Long, Long] = {
    val e2 = eps * eps
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbr = pts.map(p => p._1 -> pts.filter(q => d2(p, q) <= e2).map(_._1)).toMap
    val core = pts.collect { case p if nbr(p._1).size >= minPts => p._1 }.toSet
    // components over core-core edges (min-id labels)
    var label = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbr(c) if core(n)) {
        val m = math.min(label(c), label(n))
        if (label(c) != m || label(n) != m) {
          label += c -> m; label += n -> m; changed = true
        }
      }
    }
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> label(id)
      else {
        val coreNbrs = nbr(id).filter(core)
        if (coreNbrs.nonEmpty) id -> coreNbrs.map(label).min else id -> -1L
      }
    }.toMap
  }

  test("planted scenario: two clusters, a border point, noise") {
    // cluster A around (0,0), cluster B around (100e6, 0), border hangs off
    // A's edge (within eps of one core, not core itself), one stray
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1000L, 0L), (3L, 0L, 1000L),          // A core triangle
      (4L, 2500L, 0L),                                          // border of A
      (10L, 100000000L, 0L), (11L, 100001000L, 0L), (12L, 100000000L, 1000L), // B
      (99L, -50000000L, -50000000L))                            // noise
    val got = Dbscan.cluster(pts.toDF("id", "x", "y"), col("id"), col("x"), col("y"),
        eps = 2000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> -1L))
    assert(got === brute(pts, 2000L, 3))
  }

  test("random points match the brute-force reference across eps/minPts") {
    val rnd = new scala.util.Random(1234)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextLong(20000000L) - 10000000L, rnd.nextLong(20000000L) - 10000000L))
    for ((eps, minPts) <- Seq((800000L, 3), (1500000L, 4), (3000000L, 2))) {
      val got = Dbscan.cluster(pts.toDF("id", "x", "y"), col("id"), col("x"), col("y"),
          eps, minPts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(pts, eps, minPts), s"eps=$eps minPts=$minPts")
    }
  }

  /** Brute-force ST reference: quadratic conjunctive neighbors, BFS. */
  private def bruteST(pts: Seq[(Long, Long, Long, Long)], eps1: Long,
                      eps2: Long, minPts: Int): Map[Long, Long] = {
    val e2 = eps1 * eps1
    def near(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= e2 &&
        math.abs(a._4 - b._4) <= eps2
    val nbr = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1)).toMap
    val core = pts.collect { case p if nbr(p._1).size >= minPts => p._1 }.toSet
    var label = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbr(c) if core(n)) {
        val m = math.min(label(c), label(n))
        if (label(c) != m || label(n) != m) {
          label += c -> m; label += n -> m; changed = true
        }
      }
    }
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> label(id)
      else {
        val coreNbrs = nbr(id).filter(core)
        if (coreNbrs.nonEmpty) id -> coreNbrs.map(label).min else id -> -1L
      }
    }.toMap
  }

  test("ST: one plaza, two evenings — time splits what space merges") {
    // six points in one tight spatial blob; ids 1-3 at t≈0, ids 4-6 at
    // t≈100k with eps2 = 10k: plain DBSCAN sees ONE cluster, ST-DBSCAN two
    val pts = Seq(
      (1L, 0L, 0L, 0L), (2L, 1000L, 0L, 500L), (3L, 0L, 1000L, 900L),
      (4L, 500L, 500L, 100000L), (5L, 1500L, 0L, 100400L), (6L, 0L, 1500L, 100900L))
    val df = pts.toDF("id", "x", "y", "t")
    val st = Dbscan.clusterST(df, col("id"), col("x"), col("y"), col("t"),
        eps1 = 2000L, eps2 = 10000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    val plain = Dbscan.cluster(df, col("id"), col("x"), col("y"),
        eps = 2000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain.values.toSet === Set(1L))
  }

  test("ST: random points match the brute-force reference across operating points") {
    val rnd = new scala.util.Random(4321)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextLong(20000000L) - 10000000L, rnd.nextLong(20000000L) - 10000000L,
        rnd.nextLong(40000000L)))
    for ((eps1, eps2, minPts) <- Seq((1500000L, 4000000L, 3),
        (3000000L, 1000000L, 2), (800000L, 20000000L, 4))) {
      val got = Dbscan.clusterST(pts.toDF("id", "x", "y", "t"),
          col("id"), col("x"), col("y"), col("t"), eps1, eps2, minPts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteST(pts, eps1, eps2, minPts),
        s"eps1=$eps1 eps2=$eps2 minPts=$minPts")
    }
  }

  test("ST: eps2 past the time span degenerates to plain DBSCAN") {
    val rnd = new scala.util.Random(99)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextLong(10000000L) - 5000000L, rnd.nextLong(10000000L) - 5000000L,
        rnd.nextLong(1000000L)))
    val st = Dbscan.clusterST(pts.toDF("id", "x", "y", "t"),
        col("id"), col("x"), col("y"), col("t"),
        eps1 = 1200000L, eps2 = 100000000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Dbscan.cluster(pts.map(p => (p._1, p._2, p._3)).toDF("id", "x", "y"),
        col("id"), col("x"), col("y"), eps = 1200000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st === plain)
  }

  test("ST: pairs exactly eps2 apart in time and across a τ-bucket boundary are found") {
    // |Δt| == eps2 exactly (closed interval) with the pair straddling a
    // bucket boundary; spatially coincident; third point reaches minPts
    val pts = Seq((1L, 0L, 0L, 9999L), (2L, 0L, 0L, 19999L), (3L, 0L, 0L, 14000L))
    val got = Dbscan.clusterST(pts.toDF("id", "x", "y", "t"),
        col("id"), col("x"), col("y"), col("t"),
        eps1 = 1000L, eps2 = 10000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("cells straddling the grid: pairs exactly eps apart and cross-cell are found") {
    // two points exactly eps apart across a cell boundary, plus a third to
    // reach minPts — distance filter must be <= (closed ball)
    val pts = Seq((1L, 0L, 0L), (2L, 1000L, 0L), (3L, -1000L, 0L))
    val got = Dbscan.cluster(pts.toDF("id", "x", "y"), col("id"), col("x"), col("y"),
        eps = 1000L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only point 1 has all three within eps (2 and 3 are 2000 apart):
    // 1 is core; 2 and 3 are borders of 1's cluster
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
