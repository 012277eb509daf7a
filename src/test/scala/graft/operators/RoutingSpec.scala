package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** shortestPaths vs brute Bellman-Ford, plus hand cases: parallel-edge min,
  * unreachable nodes absent, the hop bound (H < needed hops truncates
  * exactly at dist_H), multi-source min, and early-exit = full-round parity
  * (a converged run must equal the hop-bounded invariant).
  */
class RoutingSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** dist_H by literal Bellman-Ford rounds. */
  private def brute(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                    h: Int): Map[Long, Long] = {
    var dist = sources.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to h) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  private def run(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                  h: Int): Map[Long, Long] =
    Routing.shortestPaths(edges.toDF("src", "dst", "w"),
        col("src"), col("dst"), col("w"), sources, h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph: parallel-edge min, relaxation through a longer-but-cheaper path") {
    // 0→1 (w 10), 0→1 (w 4, parallel min), 0→2 (w 1), 2→1 (w 1): best 0→1 is 2
    val edges = Seq((0L, 1L, 10L), (0L, 1L, 4L), (0L, 2L, 1L), (2L, 1L, 1L),
      (1L, 3L, 5L), (9L, 8L, 1L)) // 9→8 unreachable from 0
    val got = run(edges, Seq(0L), 8)
    assert(got === Map(0L -> 0L, 1L -> 2L, 2L -> 1L, 3L -> 7L))
  }

  test("hop bound truncates exactly at dist_H") {
    // chain 0→1→2→3 (w 1 each) with a 1-hop shortcut 0→3 (w 10)
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 10L))
    assert(run(edges, Seq(0L), 1) ===
      Map(0L -> 0L, 1L -> 1L, 3L -> 10L)) // node 2 not yet reached
    assert(run(edges, Seq(0L), 2) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 10L)) // shortcut still wins
    assert(run(edges, Seq(0L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)) // 3-hop chain relaxes
  }

  test("multi-source takes the min over origins") {
    val edges = Seq((0L, 5L, 9L), (1L, 5L, 2L))
    assert(run(edges, Seq(0L, 1L), 4) ===
      Map(0L -> 0L, 1L -> 0L, 5L -> 2L))
  }

  test("brute parity on a pseudo-random graph, H below and above diameter") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong,
        rnd.nextInt(100).toLong + 1L)
    }
    for (h <- Seq(1, 2, 4, 12))
      assert(run(edges, Seq(0L), h) === brute(edges, Seq(0L), h), s"H=$h")
  }

  // ---- labeledPaths ----

  private def bruteLab(edges: Seq[(Long, Long, Long)],
                       sources: Seq[(Long, Long)], h: Int)
      : Map[Long, (Long, Long)] = {
    var dist = sources.groupBy(_._1)
      .map { case (n, ls) => n -> ((0L, ls.map(_._2).min)) }
    for (_ <- 1 to h) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map { case (ds, l) => d -> ((ds + w, l)) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  private def runLab(edges: Seq[(Long, Long, Long)],
                     sources: Seq[(Long, Long)], h: Int)
      : Map[Long, (Long, Long)] =
    Routing.labeledPaths(edges.toDF("src", "dst", "w"),
        col("src"), col("dst"), col("w"), sources, h)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("labeledPaths: nearest source wins, ties take the smaller label, dup sources collapse") {
    // line 0-1-2-3-4 with sources at node 0 (label 7) and node 4 (label 2):
    // node 2 is equidistant → label 2 (smaller), not the closer-iterated one
    val line = (0L until 4L).flatMap(i =>
      Seq((i, i + 1, 1L), (i + 1, i, 1L)))
    val got = runLab(line, Seq((0L, 7L), (4L, 2L)), 8)
    assert(got === Map(0L -> ((0L, 7L)), 1L -> ((1L, 7L)), 2L -> ((2L, 2L)),
      3L -> ((1L, 2L)), 4L -> ((0L, 2L))))
    assert(got === bruteLab(line, Seq((0L, 7L), (4L, 2L)), 8))
    // duplicate source node with two labels keeps the smaller
    assert(runLab(line, Seq((0L, 9L), (0L, 3L)), 2)
      === bruteLab(line, Seq((0L, 9L), (0L, 3L)), 2))
  }

  test("labeledPaths: brute parity on a pseudo-random graph across horizons") {
    val rnd = new scala.util.Random(97)
    val edges = (0 until 400).map { _ =>
      (rnd.nextLong(50L), rnd.nextLong(50L), rnd.nextLong(9L) + 1L)
    }
    val srcs = Seq((0L, 5L), (17L, 1L), (33L, 3L))
    for (h <- Seq(1, 3, 8, 16))
      assert(runLab(edges, srcs, h) === bruteLab(edges, srcs, h), s"H=$h")
  }
}
