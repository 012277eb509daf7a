package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.{Similarity, TextAnalysis}

/** Round-4 NEW-operator stress at the 8M-row fixture scale (32 cores):
  *
  *   1. packSequences — the two-pass partition-offset global cumsum over
  *      8M docs (manifest only; proves the no-single-partition-window
  *      layout holds when the "window" spans the whole corpus).
  *   2. mixtureSample — integer-ppm resampling incl. 2.5× upsampling of
  *      one domain (explode(sequence) fan-out), map-only.
  *   3. redactPii — three RE2-safe java.util.regex passes per row over
  *      PII-planted captions, map-only.
  *   4. alignmentFilter — quantize + three 64-dim int dot products per
  *      row over 8M synthetic embedding pairs, map-only.
  *
  * Fixture builds are localCheckpointed and excluded from op timings
  * (same protocol as PipelineStress).
  *
  * Usage: runMain graft.tools.Round4Stress [nRows]
  */
object Round4Stress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[stress] $label: $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    // ---- text-side corpus: captions with planted PII (1 email / 2 phones /
    //      1 ip per 4 docs, the q6t scheme), content-addressed doc ids
    val docs = Fixtures.images(spark, n).select(
        xxhash64(col("image_id")).as("doc_id"),
        concat(col("caption"),
          when(pmod(xxhash64(col("image_id")), lit(4)) === 0,
              concat(lit(" mail u"), abs(xxhash64(col("image_id"))).cast("string"),
                lit("@example.com")))
            .when(pmod(xxhash64(col("image_id")), lit(4)) === 1,
              lit(" call 555-123-4567 or 555-000-1234"))
            .when(pmod(xxhash64(col("image_id")), lit(4)) === 2,
              concat(lit(" from 10.0."),
                pmod(xxhash64(col("image_id")), lit(256)).cast("string"), lit(".7")))
            .otherwise(lit(""))).as("text"),
        concat(lit("src"),
          pmod(xxhash64(col("image_id")), lit(20)).cast("string")).as("source"))
      .localCheckpoint()

    t(s"packSequences manifest over ${n / 1000000}M docs (seqLen=2048) -> rows") {
      TextAnalysis.packSequences(docs, col("doc_id"), col("text"),
        seqLen = 2048, salt = "r4").count()
    }

    t(s"mixtureSample over ${n / 1000000}M docs (src0 2.5x up, src1 half, src2 drop) -> rows") {
      TextAnalysis.mixtureSample(docs, col("doc_id"), col("source"),
        Map("src0" -> 2500000L, "src1" -> 500000L, "src2" -> 0L),
        defaultPpm = 1000000L, salt = "r4").count()
    }

    t(s"redactPii over ${n / 1000000}M PII-planted docs -> redactions") {
      TextAnalysis.redactPii(docs, col("doc_id"), col("text"))
        .agg(sum(col("n_emails") + col("n_ips") + col("n_phones")))
        .collect()(0).getLong(0)
    }

    t(s"packTokens materialization over ${n / 1000000}M docs (seqLen=2048) -> sequences") {
      TextAnalysis.packTokens(docs, col("doc_id"), col("text"),
        seqLen = 2048, salt = "r4").count()
    }

    // ---- embedding pairs: 64-dim deterministic synthetic vectors per side
    val dim = 64
    def vec(seed: Int) = transform(sequence(lit(0), lit(dim - 1)),
      i => sin((col("id") * (i + seed + 1)).cast("double")))
    val pairs = spark.range(0, n)
      .select(col("id").as("pair_id"), vec(0).as("a"), vec(7).as("b"))
      .localCheckpoint()

    t(s"alignmentFilter over ${n / 1000000}M 64-dim embedding pairs -> aligned") {
      Similarity.alignmentFilter(pairs, col("pair_id"), col("a"), col("b"),
        threshold = 0.1).where(col("aligned")).count()
    }

    spark.stop()
  }
}
