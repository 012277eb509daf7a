package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.{Multimodal, TextAnalysis}
import graft.oracle.Derive

/** Round-4 LATE-operator stress (32 cores):
  *
  *   1. zonalStats — real decode of the 1M-image fixture table replicated
  *      K× in one job (flagship protocol: scan/join/decode work scales
  *      without K× disk) through the cover join into per-zone aggregates.
  *   2. tileMosaic — same replicated input through the block-sum kernel +
  *      vec_sum per-tile grid aggregate (z=6).
  *   3. aspectBucket — metadata-only integer argmin, map-only baseline.
  *   4. importanceResample — 8M caption docs, target = 1/7th slice: two
  *      bucket-bounded model aggregates + broadcast-join scoring.
  *
  * Usage: runMain graft.tools.Round4bStress [nImages] [replicate] [nDocs]
  */
object Round4bStress {
  def main(args: Array[String]): Unit = {
    val nImg = if (args.length > 0) args(0).toLong else 1000000L
    val rep = if (args.length > 1) args(1).toInt else 8
    val nDocs = if (args.length > 2) args(2).toLong else 8000000L
    val reps = if (args.length > 3) args(3).toInt else 1 // in-JVM repeats per op
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def t[T](label: String)(body: => T): T = {
      var out: T = null.asInstanceOf[T]
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        out = body
        println(f"[stress] $label: $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        System.gc()
      }
      out
    }

    val base = Fixtures.images(spark, nImg)
    val imgs = Seq.fill(rep)(base).reduce(_ unionByName _)
    val total = nImg * rep

    t(s"zonalStats over ${total / 1000000}M images (decode + cover join + zone agg) -> zones") {
      Multimodal.zonalStats(spark, imgs, Derive.rectSpecs).count()
    }

    t(s"tileMosaic z=6 over ${total / 1000000}M images (decode + block sums + vec_sum) -> tiles") {
      Multimodal.tileMosaic(imgs, z = 6, grid = 8).count()
    }

    t(s"aspectBucket over ${total / 1000000}M images (metadata argmin) -> buckets") {
      Multimodal.aspectBucket(imgs,
          Seq((32, 32), (64, 32), (96, 32), (32, 64), (96, 64)))
        .groupBy("bucket_id").count().count()
    }

    // clip joins: 8M synthetic segments / rect features from the key rules
    val segN = nImg * rep
    val keyed = spark.range(0, segN).select(col("id"),
      graft.oracle.Derive.lonMicro(col("id")).as("x1"),
      graft.oracle.Derive.latMicro(col("id")).as("y1"))
    t(s"clipLengthJoin over ${segN / 1000000}M segments x 8 zones -> zones") {
      graft.operators.SpatialJoin.clipLengthJoin(spark,
        keyed.select(col("id"), col("x1"), col("y1"),
          (col("x1") + (col("id") * 7919L) % 2000001L - 1000000L).as("x2"),
          (col("y1") + (col("id") * 104729L) % 2000001L - 1000000L).as("y2")),
        col("id"), col("x1"), col("y1"), col("x2"), col("y2"),
        graft.oracle.Derive.rectSpecs).count()
    }
    t(s"clipAreaJoin over ${segN / 1000000}M rect features x 8 zones -> zones") {
      graft.operators.SpatialJoin.clipAreaJoin(spark,
        keyed.select(col("id"),
          (col("x1") - (col("id") * 6101L) % 1500001L).as("flo"),
          (col("y1") - (col("id") * 9203L) % 1500001L).as("fla"),
          (col("x1") + (col("id") * 6101L) % 1500001L).as("fhi"),
          (col("y1") + (col("id") * 9203L) % 1500001L).as("fha")),
        col("id"), col("flo"), col("fla"), col("fhi"), col("fha"),
        graft.oracle.Derive.rectSpecs).count()
    }

    // docs: replica-salted captions over the 1M table — distinct doc_ids
    // at nDocs scale without building an nDocs-row image fixture
    val docRep = math.max(1L, nDocs / nImg).toInt
    val docs = Seq.tabulate(docRep) { r =>
      base.select(xxhash64(concat(col("image_id"), lit(s"#$r"))).as("doc_id"),
        concat(col("caption"), lit(s" replica $r")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint()

    t(s"importanceResample over ${nImg * docRep / 1000000}M docs (2 models + broadcast scoring) -> kept") {
      TextAnalysis.importanceResample(docs, col("doc_id"), col("text"),
          docs.where(pmod(col("doc_id"), lit(7)) === 0), col("text"))
        .where(col("kept")).count()
    }

    spark.stop()
  }
}
