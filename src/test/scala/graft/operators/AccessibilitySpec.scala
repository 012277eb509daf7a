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

  // ---- huffAllocation ----------------------------------------------------

  private def bruteHuff(dem: Seq[(Long, Long, Long, Long)],
                        sup: Seq[(Long, Long, Long, Long)],
                        r: Long, wScale: Long, distQ: Long)
      : Map[Long, (Long, Long)] = {
    def d2(a: (Long, Long), b: (Long, Long)) =
      (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2)
    val alloc = scala.collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    dem.foreach { d =>
      val reach = sup.filter(s => d2((d._2, d._3), (s._2, s._3)) <= r * r)
      val ws = reach.map { s =>
        s._1 -> (s._4 * wScale) / (d2((d._2, d._3), (s._2, s._3)) / distQ + 1L)
      }
      val wsum = ws.map(_._2).sum
      ws.foreach { case (sid, w) =>
        val a = if (wsum > 0) (d._4 * w) / wsum else 0L
        val (t, n) = alloc(sid); alloc(sid) = (t + a, n + 1)
      }
    }
    sup.map(s => s._1 -> alloc(s._1)).toMap
  }

  private def runHuff(dem: Seq[(Long, Long, Long, Long)],
                      sup: Seq[(Long, Long, Long, Long)],
                      r: Long, level: Int, wScale: Long, distQ: Long)
      : Map[Long, (Long, Long)] =
    Accessibility.huffAllocation(spark,
        dem.toDF("id", "x", "y", "pop"), col("id"), col("x"), col("y"), col("pop"),
        sup.toDF("sid", "x", "y", "cap"), col("sid"), col("x"), col("y"), col("cap"),
        radiusMicro = r, level = level, wScale = wScale, distQ = distQ)
      .collect().map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap

  test("huff hand case: near/big site wins the share, empty site zerofills") {
    // demand pop 100 at origin; site 1 at d2=100 cap 100, site 2 at
    // d2=400 cap 100; distQ=100: w1 = 100*1000/(1+1) = 50000,
    // w2 = 100*1000/(4+1) = 20000; shares: 100*50000/70000 = 71,
    // 100*20000/70000 = 28 (floor); site 3 out of range -> (0, 0)
    val dem = Seq((1L, 0L, 0L, 100L))
    val sup = Seq((1L, 10L, 0L, 100L), (2L, 20L, 0L, 100L),
      (3L, 90000L, 0L, 999L))
    val got = runHuff(dem, sup, r = 1000L, level = 14,
      wScale = 1000L, distQ = 100L)
    assert(got === Map(1L -> (71L, 1L), 2L -> (28L, 1L), 3L -> (0L, 0L)))
  }

  test("huff random points match the brute-force reference") {
    val rnd = new scala.util.Random(555)
    val dem = (1L to 250L).map(i => (i,
      rnd.nextLong(20000000L) - 10000000L, rnd.nextLong(20000000L) - 10000000L,
      rnd.nextLong(100L) + 1L))
    val sup = (1L to 30L).map(j => (j,
      rnd.nextLong(20000000L) - 10000000L, rnd.nextLong(20000000L) - 10000000L,
      (rnd.nextLong(9L) + 1L) * 1000L))
    for ((r, level, q) <- Seq((3000000L, 6, 1000000000L),
        (6000000L, 5, 10000000000L))) {
      assert(runHuff(dem, sup, r, level, 1000000L, q) ===
        bruteHuff(dem, sup, r, 1000000L, q), s"r=$r level=$level q=$q")
    }
  }

  test("huff conservation: allocated demand never exceeds population") {
    val rnd = new scala.util.Random(7)
    val dem = (1L to 100L).map(i => (i,
      rnd.nextLong(4000000L), rnd.nextLong(4000000L), rnd.nextLong(50L) + 1L))
    val sup = (1L to 10L).map(j => (j,
      rnd.nextLong(4000000L), rnd.nextLong(4000000L), 1000L))
    val got = runHuff(dem, sup, 2000000L, 7, 1000000L, 1000000000L)
    val totalAlloc = got.values.map(_._1).sum
    val coveredPop = dem.filter(d => sup.exists(s =>
      (d._2 - s._2) * (d._2 - s._2) + (d._3 - s._3) * (d._3 - s._3)
        <= 2000000L * 2000000L)).map(_._4).sum
    assert(totalAlloc <= coveredPop)
    assert(totalAlloc > 0L)
  }
}
