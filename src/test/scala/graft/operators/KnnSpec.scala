package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
/** kNN ring-expansion join (SURVEY.md C4) vs in-JVM brute force. */
class KnnSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def bruteForce(pts: Seq[(Long, Long, Long)], q: Knn.QueryPt, k: Int) =
    pts.map { case (id, x, y) =>
      (id, (x - q.lonm) * (x - q.lonm) + (y - q.latm) * (y - q.latm))
    }.sortBy { case (id, d2) => (d2, id) }.take(k)

  test("ring-expansion kNN equals brute force on skewed random points") {
    val rnd = new scala.util.Random(42)
    // clustered + uniform mix, forcing multi-round expansion for far queries
    val pts = (0L until 2000L).map { i =>
      if (i % 3 == 0)
        (i, -20000000L + rnd.nextInt(2000000), 10000000L + rnd.nextInt(2000000))
      else
        (i, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L)
    }
    val queries = Seq(
      Knn.QueryPt(0, -19000000L, 11000000L),  // inside the dense cluster
      Knn.QueryPt(1, 160000000L, -75000000L), // sparse far corner
      Knn.QueryPt(2, 0L, 0L))
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val got = Knn.knnJoin(spark, df, col("id"), col("lonm"), col("latm"),
        queries, k = 7, level = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    for (q <- queries) {
      val exp = bruteForce(pts, q, 7)
      val act = got(q.qid).sortBy(_._3).map(r => (r._2, r._4)).toSeq
      assert(act === exp, s"query ${q.qid}")
    }
  }

  test("k larger than a sparse neighbourhood still returns exactly k") {
    val pts = (0L until 50L).map(i => (i, i * 6000000L - 150000000L, i * 3000000L - 75000000L))
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val q = Seq(Knn.QueryPt(9, -149000000L, -74000000L))
    val got = Knn.knnJoin(spark, df, col("id"), col("lonm"), col("latm"), q, k = 20, level = 6)
    assert(got.count() === 20)
    val exp = bruteForce(pts, q.head, 20).map(_._1)
    assert(got.orderBy("rank").collect().map(_.getLong(1)).toSeq === exp)
  }

  test("DataFrame-valued kNN join equals brute force (distributed query side)") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 2000L).map { i =>
      if (i % 3 == 0)
        (i, -20000000L + rnd.nextInt(2000000), 10000000L + rnd.nextInt(2000000))
      else
        (i, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L)
    }
    // 40 queries spanning dense cluster, sparse corners, and world edges —
    // forces per-round retirement (dense finish round 1, sparse expand on)
    val qs = (0L until 40L).map { j =>
      if (j % 4 == 0) (j, -19500000L + j * 10000, 10500000L + j * 10000)
      else (j, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L)
    }
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val qdf = spark.createDataFrame(qs).toDF("qid", "lonm", "latm")
    val got = Knn.knnJoinDf(spark, df, col("id"), col("lonm"), col("latm"),
        qdf, col("qid"), col("lonm"), col("latm"), k = 7, level = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    assert(got.size === 40)
    for ((qid, qx, qy) <- qs) {
      val exp = bruteForce(pts, Knn.QueryPt(qid, qx, qy), 7)
      val act = got(qid).sortBy(_._3).map(r => (r._2, r._4)).toSeq
      assert(act === exp, s"query $qid")
    }
  }

  test("DataFrame radius join equals brute force") {
    val rnd = new scala.util.Random(13)
    val pts = (0L until 1500L).map(i =>
      (i, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L))
    val qs = (0L until 25L).map(j =>
      (j, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L))
    val r = 20000000L
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val qdf = spark.createDataFrame(qs).toDF("qid", "lonm", "latm")
    val got = Knn.radiusJoinDf(spark, df, col("id"), col("lonm"), col("latm"),
        qdf, col("qid"), col("lonm"), col("latm"), r, level = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val exp = (for {
      (qid, qx, qy) <- qs; (id, x, y) <- pts
      d2 = (x - qx) * (x - qx) + (y - qy) * (y - qy) if d2 <= r * r
    } yield (qid, id, d2)).toSet
    assert(got === exp)
    assert(exp.nonEmpty)
  }

  test("DataFrame kNN join: empty query table yields empty result") {
    val pts = Seq((1L, 0L, 0L), (2L, 1000000L, 0L))
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val qdf = df.where(lit(false)).toDF("qid", "lonm", "latm")
    val got = Knn.knnJoinDf(spark, df, col("id"), col("lonm"), col("latm"),
      qdf, col("qid"), col("lonm"), col("latm"), k = 3, level = 5)
    assert(got.count() === 0)
    assert(got.columns.toSeq === Seq("qid", "neighbor_id", "rank", "d2"))
  }

  test("straggler ring explosion falls back to full-scan top-k (exact)") {
    // r0 large enough that (2r+1)^2 exceeds the ring-cell cap immediately:
    // the DataFrame join must take the broadcast full-scan path instead of
    // materializing a ~160k-element ring array per query row, and stay exact
    val rnd = new scala.util.Random(99)
    val pts = (0L until 300L).map(i =>
      (i, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L))
    val qs = (0L until 5L).map(j =>
      (j, rnd.nextLong(340000000L) - 170000000L, rnd.nextLong(160000000L) - 80000000L))
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val qdf = spark.createDataFrame(qs).toDF("qid", "lonm", "latm")
    val got = Knn.knnJoinDf(spark, df, col("id"), col("lonm"), col("latm"),
        qdf, col("qid"), col("lonm"), col("latm"), k = 4, level = 12, r0 = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    for ((qid, qx, qy) <- qs) {
      val exp = bruteForce(pts, Knn.QueryPt(qid, qx, qy), 4)
      assert(got(qid).sortBy(_._3).map(r => (r._2, r._4)).toSeq === exp, s"query $qid")
    }
    // driver-side variant takes the same guard
    val got2 = Knn.knnJoin(spark, df, col("id"), col("lonm"), col("latm"),
        qs.map(q => Knn.QueryPt(q._1, q._2, q._3)), k = 4, level = 12, r0 = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    for ((qid, qx, qy) <- qs) {
      val exp = bruteForce(pts, Knn.QueryPt(qid, qx, qy), 4)
      assert(got2(qid).sortBy(_._3).map(r => (r._2, r._4)).toSeq === exp, s"query $qid")
    }
  }

  test("k exceeding the table size returns the whole table ranked") {
    val pts = Seq((1L, 0L, 0L), (2L, 1000000L, 0L), (3L, -2000000L, 500000L))
    val df = spark.createDataFrame(pts).toDF("id", "lonm", "latm")
    val got = Knn.knnJoin(spark, df, col("id"), col("lonm"), col("latm"),
      Seq(Knn.QueryPt(0, 100000L, 100000L)), k = 10, level = 8)
    assert(got.count() === 3)
  }
}
