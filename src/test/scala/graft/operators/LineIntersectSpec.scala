package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** intersectJoin vs a brute-force all-pairs reference using the SAME exact
  * int64 orientation predicate and the SAME fixed IEEE crossing-point chain,
  * plus hand cases for every predicate arm: proper crossing, T-touch,
  * shared endpoint, collinear overlap, collinear disjoint, parallel
  * non-collinear, and bbox-overlap-without-intersection. Exactly-once is
  * asserted structurally (no pair dedup runs in the operator).
  */
class LineIntersectSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  type Seg = (Long, Long, Long, Long, Long) // id, x1, y1, x2, y2

  private def sgn(v: Long): Int = java.lang.Long.signum(v)
  private def cross(px: Long, py: Long, qx: Long, qy: Long, rx: Long, ry: Long): Long =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)
  private def onSeg(px: Long, py: Long, qx: Long, qy: Long, rx: Long, ry: Long): Boolean =
    rx >= math.min(px, qx) && rx <= math.max(px, qx) &&
      ry >= math.min(py, qy) && ry <= math.max(py, qy)

  /** Brute reference: all pairs, same predicate + chain. */
  private def brute(as: Seq[Seg], bs: Seq[Seg]): Set[(Long, Long, Boolean, Long, Long)] =
    (for {
      (aid, ax1, ay1, ax2, ay2) <- as
      (bid, bx1, by1, bx2, by2) <- bs
    } yield {
      val d1 = sgn(cross(ax1, ay1, ax2, ay2, bx1, by1))
      val d2 = sgn(cross(ax1, ay1, ax2, ay2, bx2, by2))
      val d3 = sgn(cross(bx1, by1, bx2, by2, ax1, ay1))
      val d4 = sgn(cross(bx1, by1, bx2, by2, ax2, ay2))
      val proper = d1 * d2 < 0 && d3 * d4 < 0
      val touches =
        (d1 == 0 && onSeg(ax1, ay1, ax2, ay2, bx1, by1)) ||
        (d2 == 0 && onSeg(ax1, ay1, ax2, ay2, bx2, by2)) ||
        (d3 == 0 && onSeg(bx1, by1, bx2, by2, ax1, ay1)) ||
        (d4 == 0 && onSeg(bx1, by1, bx2, by2, ax2, ay2))
      if (proper) {
        val num = (bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)
        val den = (ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)
        val t = num.toDouble / den.toDouble
        val ix = math.floor(ax1.toDouble + t * (ax2 - ax1).toDouble).toLong
        val iy = math.floor(ay1.toDouble + t * (ay2 - ay1).toDouble).toLong
        Some((aid, bid, true, ix, iy))
      } else if (touches) Some((aid, bid, false, 0L, 0L))
      else None
    }).flatten.toSet

  private def run(as: Seq[Seg], bs: Seq[Seg], level: Int): Seq[(Long, Long, Boolean, Long, Long)] =
    LineIntersect.intersectJoin(spark,
        as.toDF("aid", "x1", "y1", "x2", "y2"), col("aid"),
        col("x1"), col("y1"), col("x2"), col("y2"),
        bs.toDF("bid", "x1", "y1", "x2", "y2"), col("bid"),
        col("x1"), col("y1"), col("x2"), col("y2"), level)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("hand cases: every predicate arm") {
    val as = Seq[Seg](
      (1L, 0L, 0L, 10000L, 10000L),   // diagonal
      (2L, 0L, 20000L, 10000L, 20000L), // horizontal at y=20000
      (3L, 0L, 40000L, 10000L, 40000L), // collinear family base
      (4L, 0L, 60000L, 10000L, 60000L)) // for bbox-overlap-no-intersect
    val bs = Seq[Seg](
      (11L, 0L, 10000L, 10000L, 0L),    // proper X crossing with a1 at (5000,5000)
      (12L, 5000L, 20000L, 5000L, 30000L), // T-touch onto a2's interior
      (13L, 4000L, 40000L, 20000L, 40000L), // collinear OVERLAP with a3
      (14L, 20000L, 40000L, 30000L, 40000L), // collinear DISJOINT from a3 (touches at 20000? no — a3 ends at 10000)
      (15L, 0L, 61000L, 10000L, 61000L),  // parallel to a4, bboxes overlap in x only
      (16L, 10000L, 60000L, 20000L, 70000L)) // shares endpoint (10000,60000) with a4
    val got = run(as, bs, level = 14).toSet
    val want = brute(as, bs)
    assert(got === want)
    // the arms actually fired as intended
    assert(want.contains((1L, 11L, true, 5000L, 5000L)))
    assert(want.contains((2L, 12L, false, 0L, 0L)))
    assert(want.contains((3L, 13L, false, 0L, 0L)))
    assert(!want.exists { case (a, b, _, _, _) => a == 3L && b == 14L })
    assert(!want.exists { case (a, b, _, _, _) => a == 4L && b == 15L })
    assert(want.contains((4L, 16L, false, 0L, 0L)))
  }

  test("brute-force parity + exactly-once on a deterministic mixed set") {
    // deterministic pseudo-random segments spanning several cells at the
    // test level, lengths comparable to the cell size so pairs meet in
    // multiple shared cells (exercising the reference-point filter)
    def mk(idBase: Long, n: Int, mulX: Long, mulY: Long, mulDx: Long, mulDy: Long): Seq[Seg] =
      (0 until n).map { i =>
        val k = idBase + i
        val x1 = (k * mulX) % 2000000L - 1000000L
        val y1 = (k * mulY) % 1600000L - 800000L
        (k, x1, y1, x1 + (k * mulDx) % 600001L - 300000L,
          y1 + (k * mulDy) % 600001L - 300000L)
      }
    // plant one collinear-overlap pair so the touch arm is exercised at scale
    val as = mk(1L, 120, 2654435761L, 2246822519L, 7919L, 104729L) :+
      ((900L, 0L, 0L, 100000L, 0L): Seg)
    val bs = mk(1000L, 120, 40503L, 2654435761L, 104729L, 7919L) :+
      ((1900L, 50000L, 0L, 200000L, 0L): Seg)
    val got = run(as, bs, level = 10)
    assert(got.size === got.toSet.size, "a pair was produced more than once")
    assert(got.toSet === brute(as, bs))
    assert(got.count(_._3) > 10, "fixture should contain many proper crossings")
    assert(got.exists(!_._3), "fixture should contain at least one touch row")
  }

  test("degenerate zero-length segments behave as points") {
    val as = Seq[Seg]((1L, 5000L, 5000L, 5000L, 5000L)) // a point
    val bs = Seq[Seg](
      (11L, 0L, 0L, 10000L, 10000L),  // passes through (5000,5000)
      (12L, 0L, 2L, 10000L, 9999L))   // misses it (passes through (5000, 5000.5))
    val got = run(as, bs, level = 14).toSet
    assert(got === brute(as, bs))
    assert(got === Set((1L, 11L, false, 0L, 0L)))
  }
}
