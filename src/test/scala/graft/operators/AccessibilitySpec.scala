package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 2SFCA vs an in-JVM brute-force reference of the same fixed-point rule
  * set (floor-div ratios, zerofilled coverage gaps).
  */
class AccessibilitySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def brute(dem: Seq[(Long, Long, Long, Long)],
                    sup: Seq[(Long, Long, Long, Long)],
                    r: Long, scale: Long): Map[Long, (Long, Long)] = {
    def near(a: (Long, Long), b: (Long, Long)) =
      (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2) <= r * r
    val ratio = sup.map { s =>
      val dsum = dem.filter(d => near((d._2, d._3), (s._2, s._3))).map(_._4).sum
      s._1 -> (if (dsum > 0) (s._4 * scale) / dsum else 0L)
    }.toMap
    dem.map { d =>
      val reach = sup.filter(s => near((d._2, d._3), (s._2, s._3)))
      d._1 -> (reach.map(s => ratio(s._1)).sum, reach.size.toLong)
    }.toMap
  }

  private def run(dem: Seq[(Long, Long, Long, Long)],
                  sup: Seq[(Long, Long, Long, Long)],
                  r: Long, level: Int): Map[Long, (Long, Long)] =
    Accessibility.twoStepFca(spark,
        dem.toDF("id", "x", "y", "pop"), col("id"), col("x"), col("y"), col("pop"),
        sup.toDF("sid", "x", "y", "cap"), col("sid"), col("x"), col("y"), col("cap"),
        radiusMicro = r, level = level)
      .collect().map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap

  test("hand case: shared catchment splits capacity, gap zerofills") {
    // site 1 (cap 600) reaches demands 1,2 (pop 10, 20) -> R = 600e6/30 = 20e6
    // site 2 (cap 100) reaches only demand 2 (pop 20)   -> R = 100e6/20 = 5e6
    // demand 3 is out of range of everything -> (0, 0)
    val dem = Seq((1L, 0L, 0L, 10L), (2L, 800L, 0L, 20L),
      (3L, 50000000L, 0L, 7L))
    val sup = Seq((1L, 400L, 0L, 600L), (2L, 1500L, 0L, 100L))
    val got = run(dem, sup, r = 1000L, level = 12)
    assert(got === Map(
      1L -> (20000000L, 1L),
      2L -> (25000000L, 2L),
      3L -> (0L, 0L)))
  }

  test("random points match the brute-force reference across radii/levels") {
    val rnd = new scala.util.Random(777)
    val dem = (1L to 300L).map(i => (i,
      rnd.nextLong(20000000L) - 10000000L, rnd.nextLong(20000000L) - 10000000L,
      rnd.nextLong(50L) + 1L))
    val sup = (1L to 40L).map(j => (j,
      rnd.nextLong(20000000L) - 10000000L, rnd.nextLong(20000000L) - 10000000L,
      (rnd.nextLong(9L) + 1L) * 100L))
    for ((r, level) <- Seq((2000000L, 6), (5000000L, 5), (500000L, 8))) {
      assert(run(dem, sup, r, level) === brute(dem, sup, r, 1000000L),
        s"r=$r level=$level")
    }
  }

  test("zero-population catchment contributes nothing (no div-by-zero)") {
    val dem = Seq((1L, 0L, 0L, 0L))
    val sup = Seq((1L, 100L, 0L, 500L))
    assert(run(dem, sup, r = 1000L, level = 12) === Map(1L -> (0L, 1L)))
  }
}
