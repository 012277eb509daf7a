package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interval × instant temporal join vs in-JVM brute force, including
  * bin-boundary instants and intervals shorter/longer than the bin.
  */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("bin-bucketed containment join equals brute force across bin sizes") {
    val rnd = new scala.util.Random(21)
    val base = 1700000000L
    // intervals: 1 s .. 3 days long, some starting exactly on bin edges
    val ivs = (0L until 300L).map { i =>
      val s = base + rnd.nextInt(200000) - (if (i % 10 == 0) (base + rnd.nextInt(200000)) % 3600 else 0)
      val len = if (i % 3 == 0) rnd.nextInt(60) else rnd.nextInt(260000)
      (i, s, s + len)
    }
    // instants: random + exact bin edges + exact interval endpoints
    val ts = (0L until 80L).map(j => base + rnd.nextInt(260000)) ++
      Seq(base, base + 3600, ivs.head._2, ivs.head._3)
    val ivDf = ivs.toDF("id", "s_sec", "e_sec")
      .select(col("id"), col("s_sec").cast("timestamp").as("t_start"),
        col("e_sec").cast("timestamp").as("t_end"))
    val tsDf = ts.zipWithIndex.map { case (t, k) => (k.toLong, t) }.toDF("tid", "t_sec")
      .select(col("tid"), col("t_sec").cast("timestamp").as("at"))
    val expect = (for {
      (id, s, e) <- ivs; (t, k) <- ts.zipWithIndex if t >= s && t <= e
    } yield (id, k.toLong)).toSet
    for (bin <- Seq(60L, 3600L, 86400L)) {
      val got = TemporalJoin.intervalInstantJoin(ivDf, col("t_start"), col("t_end"),
          tsDf, col("at"), binSeconds = bin)
        .select("id", "tid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"bin=$bin")
    }
    assert(expect.nonEmpty)
  }

  test("interval overlap join equals brute force; multiplicity exactly 1") {
    val rnd = new scala.util.Random(22)
    val base = 1700000000L
    def mk(n: Int, seed: Int) = {
      val r2 = new scala.util.Random(seed)
      (0L until n.toLong).map { i =>
        val s = base + r2.nextInt(200000)
        (i, s, s + (if (i % 4 == 0) r2.nextInt(30) else r2.nextInt(90000)))
      }
    }
    val as = mk(120, 1); val bs = mk(150, 2)
    def df(rows: Seq[(Long, Long, Long)], idName: String) =
      rows.toDF(idName, "s_sec", "e_sec")
        .select(col(idName), col("s_sec").cast("timestamp").as("t_start"),
          col("e_sec").cast("timestamp").as("t_end"))
    val expect = (for {
      (ia, sa, ea) <- as; (ib, sb, eb) <- bs if sa <= eb && sb <= ea
    } yield (ia, ib)).toSet
    for (bin <- Seq(600L, 3600L, 86400L)) {
      val rowsOut = TemporalJoin.intervalOverlapJoin(
          df(as, "id_a"), col("t_start"), col("t_end"),
          df(bs, "id_b"), col("t_start"), col("t_end"), bin)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rowsOut.length === rowsOut.toSet.size, s"duplicates at bin=$bin")
      assert(rowsOut.toSet === expect, s"bin=$bin")
    }
    assert(expect.nonEmpty)
  }

  test("temporal joins compile to equi-joins (no range/nested-loop node)") {
    val ivDf = Seq((1L, 1700000000L, 1700003600L)).toDF("id", "s", "e")
      .select(col("id"), col("s").cast("timestamp").as("t_start"),
        col("e").cast("timestamp").as("t_end"))
    val tsDf = Seq((1L, 1700000100L)).toDF("tid", "t")
      .select(col("tid"), col("t").cast("timestamp").as("at"))
    for (plan <- Seq(
        TemporalJoin.intervalInstantJoin(ivDf, col("t_start"), col("t_end"), tsDf, col("at")),
        TemporalJoin.intervalOverlapJoin(ivDf, col("t_start"), col("t_end"),
          ivDf.withColumnRenamed("id", "id2"), col("t_start"), col("t_end")))) {
      val s = plan.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin"), s.take(800))
      assert(!s.contains("CartesianProduct"), s.take(800))
    }
  }

  test("no dedupe stage needed: output multiplicity is exactly 1") {
    val ivDf = Seq((1L, 1700000000L, 1700260000L)).toDF("id", "s", "e")
      .select(col("id"), col("s").cast("timestamp").as("t_start"),
        col("e").cast("timestamp").as("t_end"))
    val tsDf = Seq((1L, 1700100000L)).toDF("tid", "t")
      .select(col("tid"), col("t").cast("timestamp").as("at"))
    // the interval spans ~72 bins at 1h — the instant must still match once
    val got = TemporalJoin.intervalInstantJoin(ivDf, col("t_start"), col("t_end"),
      tsDf, col("at"), 3600L).collect()
    assert(got.length === 1)
  }
}
