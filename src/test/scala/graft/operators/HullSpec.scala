package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** diameter vs brute all-pairs max; convexHull kernel vs a brute hull
  * membership test; degenerate inputs (single point, duplicates, all
  * collinear).
  */
class HullSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def run(verts: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    Hull.diameter(spark, verts.toDF("pid", "x", "y"),
        col("pid"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def bruteD2(pts: Seq[(Long, Long)]): Long =
    (for { a <- pts; b <- pts } yield {
      val dx = a._1 - b._1; val dy = a._2 - b._2; dx * dx + dy * dy
    }).max

  test("kernel: hull of a square with interior/edge points is the 4 corners; collinear collapses to endpoints") {
    val sq = Array((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L),
      (5L, 5L), (5L, 0L), (0L, 3L), (10L, 10L)) // interior, edge, duplicate
    assert(Hull.convexHull(sq).toSet ===
      Set((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L)))
    val line = Array((0L, 0L), (2L, 1L), (4L, 2L), (8L, 4L), (6L, 3L))
    assert(Hull.convexHull(line).toSet === Set((0L, 0L), (8L, 4L)))
    assert(Hull.convexHull(Array((7L, 7L))).toSeq === Seq((7L, 7L)))
    assert(Hull.convexHull(Array((7L, 7L), (7L, 7L))).toSeq === Seq((7L, 7L)))
  }

  test("diameter: hand cases — single point 0, duplicates 0, square gives the diagonal") {
    val verts = Seq(
      (1L, 5L, 5L),                                     // single → 0
      (2L, 3L, 3L), (2L, 3L, 3L),                       // duplicates → 0
      (3L, 0L, 0L), (3L, 10L, 0L), (3L, 10L, 10L), (3L, 0L, 10L), (3L, 5L, 5L))
    assert(run(verts) === Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L)),
      3L -> ((5L, 200L))))
  }

  test("brute parity on pseudo-random clouds incl. collinear groups") {
    val rnd = new scala.util.Random(41)
    val verts = (0L until 30L).flatMap { pid =>
      val n = 1 + rnd.nextInt(40)
      if (pid % 7 == 0) // all-collinear group
        (0 until n).map(i => (pid, i * 3L, i * 2L))
      else (0 until n).map(_ =>
        (pid, rnd.nextInt(2000001).toLong - 1000000L,
          rnd.nextInt(2000001).toLong - 1000000L))
    }
    val expect = verts.groupBy(_._1).map { case (pid, vs) =>
      pid -> ((vs.size.toLong, bruteD2(vs.map(v => (v._2, v._3)))))
    }
    assert(run(verts) === expect)
  }
}
