package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** SQL surface for the graft expressions: every codegen kernel callable
  * from `spark.sql(...)`. Two registration paths:
  *
  *   - cluster config (spark-submit):
  *       --conf spark.sql.extensions=graft.functions.GraftExtensions
  *   - in-session: `GraftSql.registerAll(spark)` (same builders, injected
  *     through the session FunctionRegistry).
  *
  * Plan-time constant arguments (grid level, ring radius, n-gram n,
  * quantile q, sketch k) are taken as literals and folded into the
  * expression instance — they parameterize generated code, so they cannot
  * be data-dependent (the analyzer error says so).
  */
object GraftSql {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal (plan-time constant), got $other")
  }
  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Float, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal (plan-time constant), got $other")
  }

  /** name → builder for every SQL-exposed graft function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "zcell" -> (es => ZCellExpr(es(0), es(1), intLit(es(2), "zcell level"))),
    "ring_cells" -> (es => RingCellsExpr(es(0), es(1),
      intLit(es(2), "ring_cells level"), intLit(es(3), "ring_cells r"))),
    "phash_lon" -> (es => PhashLonExpr(es(0))),
    "phash_lat" -> (es => PhashLatExpr(es(0))),
    "tile_x" -> (es => TileXExpr(es(0), intLit(es(1), "tile_x z"))),
    "tile_y" -> (es => TileYExpr(es(0), intLit(es(1), "tile_y z"))),
    "merc_tile_x" -> (es => MercTileXExpr(es(0), intLit(es(1), "merc_tile_x z"))),
    "merc_tile_y" -> (es => MercTileYExpr(es(0), intLit(es(1), "merc_tile_y z"))),
    "char_hash" -> (es => CharHashExpr(es(0))),
    "char_hash64" -> (es => CharHash64Expr(es(0))),
    "simhash" -> (es => SimhashExpr(es(0))),
    "simhash64" -> (es => Simhash64Expr(es(0))),
    "minhash_sig" -> (es => MinhashSigExpr(es(0))),
    "min_shingle_hash" -> (es => MinShingleHashExpr(es(0))),
    "shingle_hashes" -> (es => ShingleHashesExpr(es(0), intLit(es(1), "shingle_hashes n"))),
    "minhash_from_hashes" -> (es => MinhashFromHashesExpr(es(0))),
    "normalize_text" -> (es => NormalizeTextExpr(Cast(es(0), StringType))),
    "repetition_stats" -> (es => RepetitionStatsExpr(es(0),
      intLit(es(1), "repetition_stats n"))),
    "quality_stats" -> (es => QualityStatsExpr(Cast(es(0), StringType))),
    "wordpiece_counts" -> (es => WordPieceCountsExpr(Cast(es(0), StringType))),
    "dot_q" -> (es => DotQExpr(es(0), es(1))),
    // the sketch aggregates read their child as Double/UTF8String internally
    // — cast HERE so spark.sql calls on INT/DECIMAL columns behave like the
    // Scala builders (which `.cast(...)` too) instead of throwing an opaque
    // ClassCastException at runtime
    "kll_quantile" -> (es => KllQuantileAgg(Cast(es(0), DoubleType),
      doubleLit(es(1), "kll_quantile q"),
      if (es.length > 2) intLit(es(2), "kll_quantile k") else 200)),
    "knn_topk" -> (es => KnnTopKAgg(es(0), intLit(es(1), "knn_topk k"))),
    "heavy_hitters" -> (es => HeavyHittersAgg(Cast(es(0), StringType),
      if (es.length > 1) intLit(es(1), "heavy_hitters k") else 200,
      if (es.length > 2) intLit(es(2), "heavy_hitters m") else 20)),
    "bloom_agg" -> (es => BloomAgg(es(0), intLit(es(1), "bloom_agg numBits"),
      if (es.length > 2) intLit(es(2), "bloom_agg numHashes") else 7)),
    "bloom_contains" -> (es => BloomContainsExpr(es(0), es(1))),
    "vec_sum" -> (es => VecSumAgg.coerced(es(0))))

  /** Register everything into an existing session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graft.FunctionRegistryBridge.register(spark, name, b)
    }
}

/** `spark.sql.extensions` entry point (spark-submit / cluster deployment):
  * injects the same function set at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSql.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), b))
    }
}
