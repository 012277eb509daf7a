package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.IcebergLite

/** Round-3 NEW-operator stress at the 8M-row fixture scale (32 cores):
  *
  *   1. decontaminate — 8M-caption corpus vs a 1k-doc benchmark set.
  *      Captions share their (adj, noun, city) 3-grams by construction, so
  *      the hit fan-out is real (not the sparse fixture regime): measures
  *      the broadcast-bench join + hits-only shuffle at scale.
  *   2. hammingPairs — 8M planted 64-bit hashes in 1M groups of 8 (the
  *      q67 perturbation scheme at scale): 24M true pairs at maxDist=2;
  *      measures banding + verify under heavy true-positive density.
  *   3. repetition — map-only kernel scan over 8M captions.
  *   4. quality→exact-dedup→repetition→split pipeline over 8M captions
  *      (the q66 composition minus decontamination, which is timed in 1).
  *   5. IcebergLite verb chain at 4M rows: 8 micro-appends → compact →
  *      merge 1% upsert → deleteWhere 1%, with a final count proving the
  *      arithmetic (4M + 40k inserts − ~40k deletes).
  *
  * Usage: runMain graft.tools.PipelineStress [nRows]
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[stress] $label: $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    // captions tripled so the 5-token fixture captions clear the quality
    // gate's n_tokens >= 10 floor (throughput is what's measured, not
    // selectivity); doc ids content-addressed like a real ingest
    val caps = Fixtures.images(spark, n).select(
      xxhash64(col("image_id")).as("doc_id"),
      concat_ws(" ", col("caption"), col("caption"), col("caption")).as("text"))
      .localCheckpoint() // fixture build/read excluded from op timings

    // 100 bench docs: the synthetic captions share (adj, noun, city)
    // 3-grams by construction, so hit fan-out per bench doc is ~corpus/512 —
    // an adversarially CONTAMINATED regime (real eval overlap is far rarer);
    // 100 docs keeps the hit shuffle ~200M rows at 8M corpus
    val bench = caps.sample(withReplacement = false, 100.0 / n, seed = 7)
    t("decontaminate corpus vs ~100-doc bench (n=3, minHits=2, dense-hit regime) -> contaminated docs") {
      Dedup.decontaminate(caps, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"), n = 3, minHits = 2)
        .select("doc_id").distinct().count()
    }

    val hashes = spark.range(0, n)
      .select(col("id"), expr("xxhash64(id div 8)").bitwiseXOR(col("id") % 8).as("h"))
    t("hammingPairs 8M planted hashes (maxDist=2) -> pairs") {
      Dedup.hammingPairs(hashes, col("id"), col("h"), maxDist = 2, bits = 64).count()
    }

    // tripled captions are ~2/3 duplicate bigrams by construction — relaxed
    // thresholds keep the downstream pipeline stages non-empty
    t("repetition metrics over 8M captions -> kept") {
      TextAnalysis.repetition(caps, col("doc_id"), col("text"),
        maxDupFrac = 0.75, maxTopFrac = 0.5)
        .where(col("repetition_keep")).count()
    }

    // stage outputs MATERIALIZED at the two multiply-referenced boundaries
    // (keepFirst scans its input twice — agg + semi-join probe — and
    // `deduped` feeds both the repetition filter and the final join): the
    // lazy composition re-ran quality up to 4x, measured 185.7 s vs ~40 s
    // materialized. At 100 TB these boundaries are parquet writes between
    // pipeline stages; localCheckpoint is the in-sandbox stand-in.
    t("pipeline quality->dedup->repetition->split over 8M captions -> train rows") {
      val kept = TextAnalysis.quality(caps, col("doc_id"), col("text"))
        .where(col("keep")).select("doc_id")
      val qualityDocs = caps.join(kept, "doc_id").localCheckpoint()
      val deduped = Dedup.keepFirst(qualityDocs,
        col("doc_id"), TextAnalysis.normalize(col("text"))).localCheckpoint()
      val rep = TextAnalysis.repetition(deduped, col("doc_id"), col("text"),
          maxDupFrac = 0.75, maxTopFrac = 0.5)
        .where(col("repetition_keep")).select("doc_id")
      deduped.join(rep, "doc_id")
        .withColumn("bucket", TextAnalysis.hashBucket(col("doc_id"), "split-v1"))
        .where(col("bucket") < 80).count()
    }

    val m = n / 2
    val tbl = java.nio.file.Files.createTempDirectory("graft_stress_ic").toString
    val rows = spark.range(0, m).select(col("id"), (col("id") % 360000000L).as("lonm"))
    t(s"iceberg: 8 micro-appends of ${m / 8} rows") {
      (0 until 8).foreach(i =>
        IcebergLite.append(spark, tbl, rows.where(col("id") % 8 === i), col("lonm")))
      IcebergLite.currentVersion(tbl)
    }
    t("iceberg: compact (target 1M rows/file)") {
      val v = IcebergLite.compact(spark, tbl, targetFileRows = 1L << 20)
      s"v$v files=${IcebergLite.snapshot(tbl, v).files.size}"
    }
    t("iceberg: merge upsert 1%") {
      IcebergLite.merge(spark, tbl,
        rows.where(col("id") % 100 === 3).withColumn("lonm", col("lonm") + 1L)
          .unionByName(rows.where(col("id") % 100 === 7)
            .withColumn("id", col("id") + 100000000L)),
        "id", col("lonm"))
    }
    t("iceberg: deleteWhere 1%") {
      IcebergLite.deleteWhere(spark, tbl, col("id") % 100 === 11, col("lonm"))
    }
    val finalRows = IcebergLite.read(spark, tbl).count()
    val expect = m + m / 100 - m / 100 // inserts == deletes at these residues
    println(s"[stress] iceberg final rows=$finalRows expect=$expect")
    require(finalRows == expect, s"iceberg chain arithmetic broke: $finalRows != $expect")
    spark.stop()
  }
}
