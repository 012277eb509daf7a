package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph — the clustering-coefficient
  * / community-density primitive (road-network mesh density, co-occurrence
  * graphs over tags, near-dup cluster quality).
  *
  * Semantics: edges are undirected; self-loops and duplicate/reversed
  * copies collapse first (canonical a < b, distinct). The result is ONE row
  * with the exact number of unordered vertex triples {x, y, z} whose three
  * edges all exist. Pure int64 — any engine reproduces it bit-for-bit.
  *
  * Plan (100 TB posture): the degree-orientation shape [Suri &
  * Vassilvitskii 2011, "Counting triangles and the curse of the last
  * reducer"]: orient every canonical edge from its lower-(degree, id)
  * endpoint to the higher one — a total order, so the oriented graph is
  * acyclic and out-degrees are O(√m) even on power-law graphs. Wedges are
  * then a self-equi-join of the oriented edges on the source, and a
  * triangle is a wedge whose (rank-ordered) far pair is itself an oriented
  * edge — ONE more equi-join. Without orientation the hub vertex of a
  * star contributes deg² wedges to a single task (the "last reducer");
  * with it, every vertex contributes ≤ outdeg² ≤ O(m). Three hash
  * exchanges total (degree agg, wedge join, closing join) — no broadcast
  * required, no driver structure; AQE handles residual wedge skew.
  */
object Graph {

  /** @param edges undirected edge list (duplicates/reversals/self-loops ok)
    * @return single row (triangles: bigint)
    */
  def triangleCount(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val canon = edges.select(
        least(u.cast("long"), v.cast("long")).as("a"),
        greatest(u.cast("long"), v.cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

    val deg = canon.select(col("a").as("n"))
      .union(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))

    // orient low-(d, n) → high-(d, n); carry the far endpoint's rank so the
    // wedge join can order its pair without re-joining degrees
    val ranked = canon
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = ranked.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst"))

    // wedges (p, q) with rank(p) < rank(q): both out-neighbours of src, so
    // the closing edge — if it exists — is oriented p → q by transitivity
    val o1 = oriented.select(col("src"), col("dst").as("p"), col("ddst").as("dp"))
    val o2 = oriented.select(col("src"), col("dst").as("q"), col("ddst").as("dq"))
    val wedges = o1.join(o2, "src")
      .where(col("dp") < col("dq") ||
        (col("dp") === col("dq") && col("p") < col("q")))
      .select(col("p"), col("q"))

    wedges.join(oriented.select(col("src").as("p"), col("dst").as("q")),
        Seq("p", "q"))
      .agg(count(lit(1)).as("triangles"))
  }
}
