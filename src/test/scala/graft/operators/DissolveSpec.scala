package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Network dissolve vs an in-JVM union-find of exact shared endpoints. */
class DissolveSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def brute(segs: Seq[(Long, Long, Long, Long, Long)])
      : Map[Long, (Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(a: Long): Long = {
      val p = parent.getOrElse(a, a)
      if (p == a) a else { val r = find(p); parent(a) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byNode = scala.collection.mutable.Map[(Long, Long), Long]()
    segs.foreach { case (id, x1, y1, x2, y2) =>
      Seq((x1, y1), (x2, y2)).foreach { n =>
        byNode.get(n) match {
          case Some(other) => union(id, other)
          case None        => byNode(n) = id
        }
      }
    }
    segs.groupBy(s => find(s._1)).map { case (cl, ss) =>
      cl -> (ss.size.toLong, ss.map { case (_, x1, y1, x2, y2) =>
        math.floor(math.sqrt(((x2 - x1) * (x2 - x1) +
          (y2 - y1) * (y2 - y1)).toDouble)).toLong
      }.sum)
    }
  }

  private def run(segs: Seq[(Long, Long, Long, Long, Long)])
      : Map[Long, (Long, Long)] =
    Dissolve.dissolveSegments(segs.toDF("sid", "x1", "y1", "x2", "y2"),
        col("sid"), col("x1"), col("y1"), col("x2"), col("y2"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hand case: chain, Y-junction, isolated segment") {
    val segs = Seq(
      // chain 1-2: (0,0)-(10,0)-(20,0)
      (1L, 0L, 0L, 10L, 0L), (2L, 10L, 0L, 20L, 0L),
      // Y: segs 5,6,7 meet at (100,100)
      (5L, 100L, 100L, 100L, 200L), (6L, 100L, 100L, 200L, 100L),
      (7L, 0L, 100L, 100L, 100L),
      // isolated
      (9L, 500L, 500L, 503L, 504L))
    val got = run(segs)
    assert(got === Map(
      1L -> ((2L, 20L)),
      5L -> ((3L, 300L)),
      9L -> ((1L, 5L))))
    assert(got === brute(segs))
  }

  test("random segment soup matches the union-find reference") {
    val rnd = new scala.util.Random(2026)
    // snap endpoints to a coarse lattice so sharing actually happens
    val segs = (1L to 500L).map { i =>
      def pt() = (rnd.nextLong(20L) * 1000L, rnd.nextLong(20L) * 1000L)
      val (x1, y1) = pt(); var (x2, y2) = pt()
      if (x1 == x2 && y1 == y2) x2 += 1000L
      (i, x1, y1, x2, y2)
    }
    assert(run(segs) === brute(segs))
  }

  test("shared endpoint must match EXACTLY — off-by-one does not merge") {
    val segs = Seq((1L, 0L, 0L, 10L, 0L), (2L, 10L, 1L, 20L, 0L))
    assert(run(segs).keySet === Set(1L, 2L))
  }
}
