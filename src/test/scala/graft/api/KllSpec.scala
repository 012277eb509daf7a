package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.KllSketch

/** KLL mergeable quantile sketch: empirical rank-error bounds vs exact
  * quantiles, including the distributed partial/merge/serialize path.
  */
class KllSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def rankError(values: Array[Double], est: Double, q: Double): Double = {
    val sorted = values.sorted
    // rank of est within the data (# values <= est), vs target rank q·n
    val r = sorted.count(_ <= est).toDouble
    math.abs(r / values.length - q)
  }

  private val rnd = new scala.util.Random(99)
  private val dists: Map[String, Array[Double]] = Map(
    "uniform" -> Array.fill(50000)(rnd.nextDouble() * 1000),
    "lognormal" -> Array.fill(50000)(math.exp(rnd.nextGaussian() * 2)),
    "clustered" -> Array.fill(50000)(
      (rnd.nextInt(5) * 100).toDouble + rnd.nextGaussian()))

  test("single-sketch rank error <= 2% at k=200 across distributions") {
    for ((name, vs) <- dists; q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val s = new KllSketch(200)
      vs.foreach(s.insert)
      val err = rankError(vs, s.quantile(q), q)
      assert(err <= 0.02, s"$name q=$q err=$err")
    }
  }

  test("merged sketches (32 partitions) keep rank error <= 2%") {
    for ((name, vs) <- dists) {
      val parts = vs.grouped(vs.length / 32 + 1).map { chunk =>
        val s = new KllSketch(200); chunk.foreach(s.insert); s
      }.toSeq
      val merged = parts.reduce { (a, b) => a.merge(b); a }
      assert(merged.count === vs.length)
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val err = rankError(vs, merged.quantile(q), q)
        assert(err <= 0.02, s"$name merged q=$q err=$err")
      }
    }
  }

  test("serialize/deserialize roundtrip preserves the sketch") {
    val s = new KllSketch(64)
    (1 to 10000).foreach(i => s.insert(i.toDouble))
    val r = KllSketch.deserialize(s.serialize())
    assert(r.count === s.count)
    for (q <- Seq(0.1, 0.5, 0.9)) assert(r.quantile(q) === s.quantile(q))
    // a restored sketch keeps accepting inserts and merges
    (10001 to 12000).foreach(i => r.insert(i.toDouble))
    assert(r.count === 12000)
  }

  test("Reducer.sketchQuantile: distributed agg within 2% rank error of exact") {
    val data = dists("lognormal").zipWithIndex.map { case (v, i) => (i % 3, v) }
    val df = spark.createDataFrame(data.toIndexedSeq).toDF("g", "v").repartition(16)
    val sk = Reducer.on(df).aggregateBy("g", col("g")).sketchQuantile(col("v"), 0.5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val byG = data.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    for ((g, vs) <- byG) {
      val err = rankError(vs, sk(g), 0.5)
      assert(err <= 0.02, s"group $g err=$err")
    }
  }

  test("sketchQuantiles: one column per q, each within 2% rank error") {
    val data = dists("uniform").zipWithIndex.map { case (v, i) => (i % 2, v) }
    val df = spark.createDataFrame(data.toIndexedSeq).toDF("g", "v").repartition(8)
    val rows = Reducer.on(df).aggregateBy("g", col("g"))
      .sketchQuantiles(col("v"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byG = data.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    for ((g, vs) <- byG; (q, est) <- Seq(0.25, 0.5, 0.75).zip(
        Seq(rows(g)._1, rows(g)._2, rows(g)._3))) {
      assert(rankError(vs, est, q) <= 0.02, s"g=$g q=$q")
    }
  }

  test("empty group yields null, single value yields itself") {
    val s = new KllSketch(32)
    assert(s.quantile(0.5).isNaN)
    s.insert(42.0)
    assert(s.quantile(0.0) === 42.0 && s.quantile(1.0) === 42.0)
  }
}
