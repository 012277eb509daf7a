package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** triangleCount vs brute enumeration over canonical triples, plus hand
  * cases: duplicate/reversed/self-loop edges collapse, a star has zero
  * triangles (the orientation's worst pre-image), K4 has exactly 4.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Long = {
    val e = edges.collect { case (u, v) if u != v =>
      (math.min(u, v), math.max(u, v))
    }.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      x = nodes(i); y = nodes(j); z = nodes(k)
      if e((x, y)) && e((y, z)) && e((x, z))
    } yield 1).size.toLong
  }

  private def run(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("u", "v"), col("u"), col("v"))
      .collect().head.getLong(0)

  test("hand cases: dups/reversals/self-loops collapse; star 0; K4 = 4") {
    // triangle given as (1,2), (2,1) reversed dup, (2,3), (1,3) + noise
    assert(run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 1L))) === 1L)
    // star around 0: no closing edges
    assert(run((1L to 20L).map(i => (0L, i))) === 0L)
    // K4
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    assert(run(k4) === 4L)
  }

  test("brute parity on a pseudo-random multigraph") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 500).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
    }
    assert(run(edges) === brute(edges))
  }

  // ---- pageRank: independent replay of the integer rule ----

  private def brutePr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val SCALE = 1000000000000L
    val BASE = 15L * SCALE / 100L
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> SCALE).toMap
    (1 to iters).foreach { _ =>
      val s = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = nodes.map(n => n -> (BASE + 85L * s.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def runPr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("u", "v"), col("u"), col("v"), iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("pageRank hand cases: cycle is uniform; star hub collects, leaves get BASE") {
    val SCALE = 1000000000000L
    val BASE = 15L * SCALE / 100L
    // 4-cycle: out-degree 1 everywhere, perfectly symmetric → every round
    // keeps all ranks equal; with r_0 = SCALE the fixpoint is SCALE itself
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(runPr(cycle, 5).values.toSet === Set(SCALE))
    // star INTO the hub: leaves have no in-edges → BASE after round 1;
    // hub's round-2 value is BASE + 85 * (3 * BASE) / 100
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L))
    val got = runPr(star, 2)
    assert(got(1L) === BASE && got(2L) === BASE && got(3L) === BASE)
    assert(got(0L) === BASE + 85L * (3L * BASE) / 100L)
  }

  test("pageRank brute parity on a pseudo-random digraph, incl dup edges and dangling nodes") {
    val rnd = new scala.util.Random(23)
    // node 50 only ever appears as dst (dangling in-only), dups frequent
    val edges = (0 until 400).map { i =>
      if (i % 40 == 0) (rnd.nextInt(30).toLong, 50L)
      else (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
    }.filter(p => p._1 != p._2)
    assert(runPr(edges, 6) === brutePr(edges, 6))
  }
}
