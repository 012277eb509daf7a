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
}
