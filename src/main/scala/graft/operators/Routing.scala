package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-hop single-source shortest path over the (snapped) road
  * network — the routing/reachability verb downstream of map matching
  * (q7t): "network distance from the depot to every reachable node within
  * H hops". Upstream users run this off-engine after exporting ways; we
  * keep it on the cluster.
  *
  * Semantics (exact, deterministic): directed edges (src, dst, w) with
  * int64 weight w ≥ 0; dist_H(v) = min over all paths from any source to v
  * using ≤ H edges of the path's weight sum. Output is one row per node
  * with dist_H(v) < ∞. With H ≥ graph diameter this IS single-source
  * shortest path; the hop bound makes the operator a finite, oracle-
  * expressible fixpoint prefix (each round is one Bellman-Ford relaxation,
  * so round k holds exactly dist_k — the textbook invariant).
  *
  * All arithmetic is int64 adds and mins — no floats anywhere — so any
  * engine reproduces it bit-for-bit. Weight sums must stay < 2^63
  * (caller's contract: H · max(w) bounds the reachable sum).
  *
  * Plan (100 TB posture): the Pregel/Bellman-Ford shape — per round ONE
  * equi-join of the frontier dist table against the edge table on src
  * (shuffle ∝ out-degree of reached nodes, AQE-skew-safe) and ONE hash
  * min-aggregate; `localCheckpoint` truncates the iterative lineage each
  * round (the dupClusters discipline — un-truncated, round k's plan
  * re-executes all k−1 prior joins). Early exit when a round changes no
  * dist: dist_k = dist_{k-1} is a fixpoint of relaxation, so all later
  * rounds are provably identical — the probe is a filter over the two
  * checkpointed tables, not an extra shuffle. The edge table is scanned
  * once per round and never collected; nothing driver-sized anywhere.
  * Negative-cycle hazards don't exist (w ≥ 0 enforced, hops bounded).
  */
object Routing {

  /** @param edges   (src, dst, w) directed weighted edge table
    * @param sources source node ids (dist 0), driver-side (a routing query
    *                names its origins; this is not data-sized)
    * @param maxHops H — relaxation rounds / path-length bound
    * @return (node, dist) for every node reachable in ≤ H hops
    */
  def shortestPaths(edges: DataFrame, src: Column, dst: Column, w: Column,
                    sources: Seq[Long], maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64, "maxHops must be in [0, 64]")
    require(sources.nonEmpty, "need at least one source node")
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(src.cast("long").as("_src"),
        dst.cast("long").as("_dst"), w.cast("long").as("_w"))
      .where(col("_w") >= 0L)
      .localCheckpoint() // edge derivation runs ONCE, not once per round

    var dist = sources.distinct.toDF("node")
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxHops && !converged) {
      val relaxed = dist.join(e, col("node") === col("_src"))
        .select(col("_dst").as("node"), (col("dist") + col("_w")).as("dist"))
      val next = dist.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
      // fixpoint probe: relaxation is monotone (dists only decrease, the
      // reached set only grows), so "no row improved AND no row appeared"
      // ⟺ next = dist ⟺ every later round returns the same table. A left
      // join over the two checkpointed tables — no recompute.
      converged = next.join(dist.withColumnRenamed("dist", "_old"),
          Seq("node"), "left")
        .where(col("_old").isNull || col("dist") < col("_old"))
        .limit(1).count() == 0
      dist = next
      round += 1
    }
    dist
  }

  /** LABELED multi-source shortest paths — [[shortestPaths]] where every
    * source carries a LABEL and each node reports the label of its nearest
    * source (ties → smallest label): the allocation/catchment verb
    * ("which depot serves this node"), i.e. network Voronoi. The
    * per-round reduction is the lexicographic min over (dist, label) —
    * monotone in that lattice, so the relaxation is confluent and the
    * bounded prefix d_H is engine-invariant like the unlabeled operator.
    *
    * Output: (node, dist, label) for every node reachable in ≤ H hops.
    *
    * Plan: identical Pregel discipline; the per-node reduction runs
    * through [[graft.functions.ArgMinLongsAgg]] (ObjectHashAggregate,
    * map-side partial argmin, no sort node — `min(struct)` would plan a
    * SortAggregate on both sides of the exchange).
    */
  def labeledPaths(edges: DataFrame, src: Column, dst: Column, w: Column,
                   sources: Seq[(Long, Long)], maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64, "maxHops must be in [0, 64]")
    require(sources.nonEmpty, "need at least one (source, label)")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(src.cast("long").as("_src"),
        dst.cast("long").as("_dst"), w.cast("long").as("_w"))
      .where(col("_w") >= 0L)
      .localCheckpoint()
    // duplicate source nodes collapse to their smallest label up front
    var dist = sources.groupBy(_._1).map { case (n, ls) =>
        (n, ls.map(_._2).min)
      }.toSeq.toDF("node", "lab")
      .select(col("node"), lit(0L).as("dist"), col("lab"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxHops && !converged) {
      val relaxed = dist.join(e, col("node") === col("_src"))
        .select(col("_dst").as("node"), (col("dist") + col("_w")).as("dist"),
          col("lab"))
      val next = dist.union(relaxed)
        .groupBy("node")
        .agg(graft.functions.ArgMinLongsAgg.argminLongs(
          struct(col("dist"), col("lab"))).as("_m"))
        .select(col("node"), col("_m.dist").as("dist"), col("_m.lab").as("lab"))
        .localCheckpoint()
      converged = next.join(dist.withColumnRenamed("dist", "_od")
          .withColumnRenamed("lab", "_ol"), Seq("node"), "left")
        .where(col("_od").isNull || col("dist") < col("_od") ||
          (col("dist") === col("_od") && col("lab") < col("_ol")))
        .limit(1).count() == 0
      dist = next
      round += 1
    }
    dist
  }
}
