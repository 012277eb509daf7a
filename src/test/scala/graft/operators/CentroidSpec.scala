package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** labelPoints vs an independent shoelace replay, plus hand cases: square
  * centroid, orientation sign, collinear/degenerate rings dropped.
  */
class CentroidSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def run(verts: Seq[(Long, Long, Long, Long)]): Map[Long, (Long, Long, Long)] =
    Centroid.labelPoints(verts.toDF("pid", "idx", "x", "y"),
        col("pid"), col("idx"), col("x"), col("y"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def brute(verts: Seq[(Long, Long, Long, Long)]): Map[Long, (Long, Long, Long)] =
    verts.groupBy(_._1).flatMap { case (pid, vs) =>
      val ring = vs.sortBy(_._2).map(v => (v._3, v._4))
      val (x0, y0) = ring.head
      val rel = ring.map { case (x, y) => (x - x0, y - y0) }
      val pairs = rel.zip(rel.tail :+ rel.head)
      val cross = pairs.map { case ((ax, ay), (bx, by)) => ax * by - bx * ay }
      val a2 = cross.sum
      if (a2 == 0L) None
      else {
        val cx6a = pairs.zip(cross).map { case (((ax, _), (bx, _)), c) => (ax + bx) * c }.sum
        val cy6a = pairs.zip(cross).map { case (((_, ay), (_, by)), c) => (ay + by) * c }.sum
        val cx = math.floor(x0.toDouble + cx6a.toDouble / (3L * a2).toDouble).toLong
        val cy = math.floor(y0.toDouble + cy6a.toDouble / (3L * a2).toDouble).toLong
        Some(pid -> ((a2, cx, cy)))
      }
    }

  test("hand cases: square centroid, orientation sign, degenerate dropped") {
    // CCW unit-ish square at (100, 200), side 10 → centroid (105, 205), a2 = 200
    val sq = Seq((1L, 0L, 100L, 200L), (1L, 1L, 110L, 200L),
      (1L, 2L, 110L, 210L), (1L, 3L, 100L, 210L))
    // same square CW → a2 = -200, same centroid
    val sqCw = sq.map { case (_, i, x, y) => (2L, 3L - i, x, y) }
    // collinear ring: zero area, dropped
    val line = Seq((3L, 0L, 0L, 0L), (3L, 1L, 5L, 0L), (3L, 2L, 9L, 0L))
    val got = run(sq ++ sqCw ++ line)
    assert(got === Map(1L -> ((200L, 105L, 205L)), 2L -> ((-200L, 105L, 205L))))
  }

  test("brute parity on pseudo-random rings incl. self-intersecting and far-from-origin") {
    val rnd = new scala.util.Random(37)
    val verts = (0L until 40L).flatMap { pid =>
      val n = 3 + rnd.nextInt(8)
      val cx = rnd.nextLong() % 170000000L
      val cy = rnd.nextLong() % 80000000L
      (0L until n.toLong).map { i =>
        (pid, i, cx + rnd.nextInt(600001) - 300000L,
          cy + rnd.nextInt(600001) - 300000L)
      }
    }
    assert(run(verts) === brute(verts))
    assert(run(verts).size >= 38) // degenerate rings are measure-zero
  }
}
