package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.{Dedup, TextAnalysis}

/** Per-stage profile of the q66-shaped pipeline at stress scale: which of
  * quality / exact-dedup / repetition / split dominates the 8M-caption run.
  * Usage: runMain graft.tools.ProfilePipeline [nRows]
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val caps = Fixtures.images(spark, n).select(
      xxhash64(col("image_id")).as("doc_id"),
      concat_ws(" ", col("caption"), col("caption"), col("caption")).as("text"))
      .localCheckpoint()

    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.1f s  ($out)")
    }

    t("quality only") {
      TextAnalysis.quality(caps, col("doc_id"), col("text"))
        .where(col("keep")).count()
    }
    t("keepFirst (exact dedup) only") {
      Dedup.keepFirst(caps, col("doc_id"), TextAnalysis.normalize(col("text"))).count()
    }
    t("keepFirst substage: normalize+hash+agg") {
      caps.select(col("doc_id").as("_id"),
          graft.functions.TextFunctions.charHash64(
            TextAnalysis.normalize(col("text"))).as("_kh"))
        .groupBy("_kh").agg(min(col("_id")).as("_keep_id")).count()
    }
    t("keepFirst substage: normalize only") {
      caps.select(length(TextAnalysis.normalize(col("text"))).as("l"))
        .agg(max("l")).collect()
    }
    t("keepFirst substage: hash only (no normalize)") {
      caps.select(graft.functions.TextFunctions.charHash64(col("text")).as("h"))
        .agg(max("h")).collect()
    }
    locally {
      val keep = caps.select(col("doc_id").as("_id"),
          graft.functions.TextFunctions.charHash64(
            TextAnalysis.normalize(col("text"))).as("_kh"))
        .groupBy("_kh").agg(min(col("_id")).as("_keep_id"))
        .select(col("_keep_id")).localCheckpoint()
      t("keepFirst substage: semi-join only") {
        caps.join(keep, col("doc_id") === col("_keep_id"), "left_semi").count()
      }
    }
    t("repetition only") {
      TextAnalysis.repetition(caps, col("doc_id"), col("text"),
        maxDupFrac = 0.75, maxTopFrac = 0.5).where(col("repetition_keep")).count()
    }
    t("split only") {
      caps.withColumn("bucket", TextAnalysis.hashBucket(col("doc_id"), "split-v1"))
        .where(col("bucket") < 80).count()
    }
    t("langId only") {
      TextAnalysis.langId(caps, col("doc_id"), col("text"))
        .groupBy("pred_lang").count().collect().length
    }
    t("tokenCounts only") {
      TextAnalysis.tokenCounts(caps, col("doc_id"), col("text"))
        .agg(sum("n_wordpieces")).collect().head.getLong(0)
    }
    spark.stop()
  }
}
