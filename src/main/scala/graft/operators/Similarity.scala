package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search for training-data pipelines: brute-force
  * top-k as the exact baseline, hyperplane-LSH bucketing as the
  * approximate scale path, and cosine near-dup pair detection.
  *
  * Numeric contract: every ranking metric is computed on QUANTIZED
  * embeddings — `q[i] = floor(x[i]·1e6 + 0.5)` as int64 — so dot products
  * and squared norms are exact integers (64 dims × (1e6·float)² ≈ 6.4e13
  * << 2^63) and rankings are bit-reproducible across engines; the DuckDB
  * twin reproduces them from the raw float column. Doubles appear only in
  * the final cosine comparison, as products of exactly-representable
  * integers (deterministic IEEE ops in both engines).
  */
object Similarity {

  /** float array → exact int64 quantized array (shared formula). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Exact int64 dot product of two quantized vectors (codegen'd primitive
    * loop — see graft.functions.DotQExpr).
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.TextFunctions.dotQ(a, b)

  /** Brute-force exact top-k by quantized dot product (self excluded,
    * ties → smaller neighbor id). `queries` is broadcast — at scale the
    * query set is the small side by construction; the big side streams
    * through one codegen stage and only (qid, nid, dot) survive to the
    * per-query top-k shuffle.
    */
  def topKDot(points: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    val p = points.select(col(idCol).as("nid"), quantize(col(vecCol)).as("pq"))
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    p.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", dotQ(col("pq"), col("qq")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("dot"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * an integer in [-1e6, 1e6] from a splitmix-style avalanche — Spark-side
    * only (the ANN result is approximate; its gate is the recall spec, not
    * a SQL oracle).
    */
  def planeComponent(plane: Int, dim: Int): Long = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z % 1000001L)
  }

  /** Hyperplane-LSH ANN: `planes` sign bits → bucket id; candidates =
    * same-bucket pairs across `tables` independent hash tables; exact
    * re-rank inside candidates. Approximate (recall < 1), tested against
    * the brute-force baseline by recall assertion.
    *
    * Scale: buckets partition the corpus — each query probes its own
    * bucket per table, so the join is equi-key and broadcastable on the
    * query side; no all-pairs stage.
    */
  def annTopK(spark: SparkSession, points: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, dims: Int,
              planes: Int = 4, tables: Int = 8): DataFrame = {
    val planeMatrix = Array.tabulate(tables * planes, dims)((pl, d) => planeComponent(pl, d))
    def withBuckets(df: DataFrame, id: String, out: String, vq: String): DataFrame =
      df.select(col(idCol).as(id), quantize(col(vecCol)).as(vq))
        .select(col(id), col(vq), posexplode(
          graft.functions.TextFunctions.hyperplaneBuckets(col(vq), planeMatrix, planes, tables))
          .as(Seq("table", "bucket")))

    val p = withBuckets(points, "nid", "p", "pq")
    val q = withBuckets(queries, "qid", "q", "qq")

    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    p.join(broadcast(q), Seq("table", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("pq"), col("qq")).distinct()
      .withColumn("dot", dotQ(col("pq"), col("qq")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("dot"))
  }

  /** Cosine near-duplicate pairs: cos(a,b) ≥ threshold, evaluated without
    * square roots as dot>0 ∧ dot² ≥ t²·|a|²·|b|² on exact integer inputs
    * (the final comparison is deterministic double arithmetic).
    *
    * Brute force (candidate generation for the exact gate); the scale path
    * chains [[annTopK]] buckets in front of the same verify.
    */
  def cosineNearDupPairs(points: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val p = points.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotQ(col("q"), col("q")))
    val a = p.select(col("id").as("id_a"), col("q").as("qa"), col("n2").as("na"))
    val b = p.select(col("id").as("id_b"), col("q").as("qb"), col("n2").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .where(col("dot") > 0 &&
        col("dot").cast("double") * col("dot").cast("double") >=
          lit(threshold * threshold) * col("na").cast("double") * col("nb").cast("double"))
      .select(col("id_a"), col("id_b"), col("dot"))
  }
}
