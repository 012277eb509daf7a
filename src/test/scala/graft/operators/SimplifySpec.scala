package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** douglasPeucker vs an independent recursive reference (same rule set,
  * recursion instead of the operator's explicit stack), plus hand cases:
  * straight line collapses, zigzag peaks survive, strict-> at eps, lowest-
  * idx tie-break, degenerate closed chord, and tiny inputs (n <= 2).
  */
class SimplifySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  type V = (Long, Long, Long, Long) // doc, idx, x, y

  /** Plain recursive reference over one polyline's sorted vertices. */
  private def bruteDp(xs: Array[Long], ys: Array[Long], eps2: Long): Set[Int] = {
    def d2q(i: Int, j: Int, k: Int): Long = {
      val dx = (xs(j) - xs(i)).toDouble; val dy = (ys(j) - ys(i)).toDouble
      val wx = (xs(k) - xs(i)).toDouble; val wy = (ys(k) - ys(i)).toDouble
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0.0) 0.0
              else math.min(math.max((wx * dx + wy * dy) / len2, 0.0), 1.0)
      val ex = wx - t * dx; val ey = wy - t * dy
      math.floor(ex * ex + ey * ey).toLong
    }
    def rec(i: Int, j: Int): Set[Int] =
      if (j - i < 2) Set(i, j)
      else {
        val k = (i + 1 until j).maxBy(k => (d2q(i, j, k), -k.toLong))
        if (d2q(i, j, k) > eps2) rec(i, k) ++ rec(k, j) else Set(i, j)
      }
    rec(0, xs.length - 1)
  }

  private def run(rows: Seq[V], eps: Long): Set[(Long, Long)] =
    Simplify.douglasPeucker(spark, rows.toDF("doc", "idx", "x", "y"),
        col("doc"), col("idx"), col("x"), col("y"), eps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hand cases") {
    val rows = Seq[V](
      // doc 1: collinear — collapses to endpoints
      (1L, 0L, 0L, 0L), (1L, 1L, 1000L, 0L), (1L, 2L, 2000L, 0L), (1L, 3L, 3000L, 0L),
      // doc 2: one sharp peak above eps survives, a small bump does not
      (2L, 0L, 0L, 0L), (2L, 1L, 1000L, 5000L), (2L, 2L, 2000L, 0L),
      (2L, 3L, 3000L, 40L), (2L, 4L, 4000L, 0L),
      // doc 3: exactly eps away — strict > drops it (d = 1000, eps = 1000)
      (3L, 0L, 0L, 0L), (3L, 1L, 1000L, 1000L), (3L, 2L, 2000L, 0L),
      // doc 4: symmetric twin peaks — lowest idx wins the first split
      (4L, 0L, 0L, 0L), (4L, 1L, 1000L, 3000L), (4L, 2L, 2000L, 0L),
      (4L, 3L, 3000L, 3000L), (4L, 4L, 4000L, 0L),
      // doc 5: closed loop (chord endpoints coincide) — point-distance arm
      (5L, 0L, 0L, 0L), (5L, 1L, 5000L, 0L), (5L, 2L, 5000L, 5000L), (5L, 3L, 0L, 0L),
      // doc 6/7: tiny inputs
      (6L, 0L, 10L, 10L), (6L, 1L, 20L, 20L),
      (7L, 0L, 7L, 7L))
    val got = run(rows, 1000L)
    val want = rows.groupBy(_._1).toSeq.flatMap { case (doc, vs) =>
      val s = vs.sortBy(_._2)
      bruteDp(s.map(_._3).toArray, s.map(_._4).toArray, 1000L * 1000L)
        .map(p => (doc, s(p)._2))
    }.toSet
    assert(got === want)
    assert(got.filter(_._1 == 1L).map(_._2) === Set(0L, 3L))
    assert(got.contains((2L, 1L)))                               // the sharp peak survives
    assert(got.filter(_._1 == 3L).map(_._2) === Set(0L, 2L))     // strict >
    assert(got.contains((4L, 1L)) && got.contains((4L, 3L)))     // both twin peaks survive
    assert(got.filter(_._1 == 5L).map(_._2) === Set(0L, 1L, 2L, 3L)) // loop survives
    assert(got.filter(_._1 == 6L).map(_._2) === Set(0L, 1L))
    assert(got.filter(_._1 == 7L).map(_._2) === Set(0L))
  }

  test("brute parity on deterministic wiggly lines, several eps values") {
    val rows: Seq[V] = (0L until 40L).flatMap { doc =>
      (0L to (doc % 13 + 2)).map { i =>
        (doc, i, i * 1000L, (doc * 7919L + i * 104729L) % 9001L - 4500L)
      }
    }
    for (eps <- Seq(0L, 500L, 2000L, 10000L)) {
      val got = run(rows, eps)
      val want = rows.groupBy(_._1).toSeq.flatMap { case (doc, vs) =>
        val s = vs.sortBy(_._2)
        bruteDp(s.map(_._3).toArray, s.map(_._4).toArray, eps * eps)
          .map(p => (doc, s(p)._2))
      }.toSet
      assert(got === want, s"eps=$eps")
    }
  }
}
