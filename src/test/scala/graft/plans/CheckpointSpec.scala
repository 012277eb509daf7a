package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

object FailOnce {
  @volatile var armed = false
}

class CheckpointSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"ckpt_$tag").toString
    d
  }

  private def input: DataFrame =
    (0L until 1000L).map(i => (i, i % 37, s"v$i")).toDF("id", "key", "payload")

  private def transform(df: DataFrame): DataFrame =
    df.groupBy("_bucket", "key").agg(count(lit(1)).as("cnt"), sum("id").as("sum_id"))

  private def direct: Set[(Long, Long, Long)] =
    input.groupBy("key").agg(count(lit(1)).as("cnt"), sum("id").as("sum_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("partial attempt + resume == direct run; completed buckets not recomputed") {
    val out = freshDir("resume")
    val r1 = CheckpointedRun.runAttempt(spark, input, col("key"), transform, 8, out, "j1",
      maxBuckets = 3)
    assert(r1.processed.size === 3 && r1.skipped.isEmpty)
    assert(CheckpointedRun.completedBuckets(out).size === 3)

    val r2 = CheckpointedRun.runAttempt(spark, input, col("key"), transform, 8, out, "j1")
    assert(r2.processed.size === 5)
    assert(r2.skipped.toSet === r1.processed.toSet)
    val got = r2.output.select("key", "cnt", "sum_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === direct)

    // third attempt is a no-op
    val r3 = CheckpointedRun.runAttempt(spark, input, col("key"), transform, 8, out, "j1")
    assert(r3.processed.isEmpty)
  }

  test("crash mid-attempt leaves buckets pending; runToCompletion recovers") {
    val out = freshDir("crash")
    FailOnce.armed = true
    val failing: DataFrame => DataFrame = df => {
      val f = udf((b: Int) => {
        if (FailOnce.armed && b >= 4) throw new RuntimeException("injected executor failure")
        b
      })
      transform(df.withColumn("_bucket", f(col("_bucket"))))
    }
    intercept[Exception] {
      CheckpointedRun.runAttempt(spark, input, col("key"), failing, 8, out, "j2")
    }
    // nothing committed: the attempt died before its manifest landed
    assert(CheckpointedRun.completedBuckets(out).isEmpty)

    FailOnce.armed = false
    val result = CheckpointedRun.runToCompletion(spark, input, col("key"), transform, 8, out, "j2")
    val got = result.select("key", "cnt", "sum_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === direct)
  }

  test("resume mid-tiling: checkpointed flagship tiling equals the direct run") {
    import org.apache.spark.sql.functions.{col, count, lit}
    import graft.functions.GraftFunctions._
    import graft.operators.SpatialJoin
    val out = freshDir("tiling")
    val imgs = graft.fixtures.Fixtures.images(spark, 20000)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val polys = graft.fixtures.Fixtures.polygons
    val tile: DataFrame => DataFrame = df => {
      val j = SpatialJoin.join(spark, df, col("lon"), col("lat"), polys)
      SpatialJoin.assignTiles(j, col("lon"), col("lat"), 12)
        .groupBy("_bucket", "poly_id", "tile_z", "tile_x", "tile_y")
        .agg(count(lit(1)).as("n"))
    }
    // first attempt dies after half the buckets; resume finishes the rest
    CheckpointedRun.runAttempt(spark, imgs, col("phash"), tile, 8, out, "tiling", maxBuckets = 4)
    assert(CheckpointedRun.completedBuckets(out).size === 4)
    val resumed = CheckpointedRun.runToCompletion(spark, imgs, col("phash"), tile, 8, out, "tiling")
      .groupBy("poly_id", "tile_z", "tile_x", "tile_y").agg(sum("n").as("n"))
    val direct = {
      val j = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), polys)
      SpatialJoin.assignTiles(j, col("lon"), col("lat"), 12)
        .groupBy("poly_id", "tile_z", "tile_x", "tile_y").agg(count(lit(1)).as("n"))
    }
    val a = resumed.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val b = direct.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("lineage records per-partition rows and attempt metrics") {
    val out = freshDir("lineage")
    CheckpointedRun.runToCompletion(spark, input, col("key"), transform, 4, out, "j3")
    val lines = Files.list(Paths.get(out, "_lineage")).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    val bucketLines = lines.filter(_.contains("\"status\": \"ok\""))
    assert(bucketLines.size === 4)
    assert(bucketLines.forall(_.contains("\"input_rows\"")))
    val inputTotal = "\"input_rows\": (\\d+)".r.findAllMatchIn(bucketLines.mkString("\n"))
      .map(_.group(1).toLong).sum
    assert(inputTotal === 1000L)
    val outputTotal = "\"output_rows\": (\\d+)".r.findAllMatchIn(bucketLines.mkString("\n"))
      .map(_.group(1).toLong).sum
    assert(outputTotal === 37L) // 37 distinct keys ⇒ 37 aggregate rows
    assert(lines.exists(_.contains("\"kind\": \"metrics\"")))
  }

  test("an attempt runs ONE Spark job over the input (no lineage re-scans)") {
    val out = freshDir("jobcount")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      CheckpointedRun.runAttempt(spark, input, col("key"), transform, 8, out, "j4")
      Thread.sleep(500) // let the listener bus drain (private API in Spark 4)
    } finally spark.sparkContext.removeSparkListener(l)
    // AQE runs the write query as stage jobs (shuffle + write = 2) plus one
    // schema read for the returned cumulative-output DataFrame = 3; the old
    // implementation added 2 full-scan count jobs (input groupBy + output
    // re-read) on top, i.e. ≥5
    assert(jobs.get() <= 3, s"expected <=3 jobs, saw ${jobs.get()}")
  }

  test("staged pipeline (q66 chain): crash mid-stage resumes; completed stages not recomputed") {
    import graft.operators.{Dedup, TextAnalysis}
    val words = Vector("alpha", "bravo", "canyon", "delta", "ember", "forest",
      "granite", "harbor", "island", "juniper", "kestrel", "lumen", "meadow",
      "nectar", "onyx", "prairie")
    def sentence(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(words(r.nextInt(words.size))).mkString(" ")
    }
    // the q66 shapes: quality failures, normalized dups, bench contamination
    val docs = (0L until 120L).map { i =>
      val text =
        if (i == 7L || i == 21L || i == 77L)
          sentence((i - 1).toInt, 24).capitalize + "!" // normalized dup of i-1
        else if (i % 17L == 3L) "x y"                  // fails the quality gate
        else if (i == 51L)                             // shares >=3 shingles with bench doc 50
          sentence(50, 24).split(" ").take(12).mkString(" ") + " " + sentence(5100, 12)
        else sentence(i.toInt, 24)
      (i, text)
    }.toDF("doc_id", "text")
    val bench = docs.where(col("doc_id") % 50 === 0)

    val stages = Seq(
      CheckpointedRun.Stage("quality", col("doc_id"), 4, d =>
        d.join(TextAnalysis.quality(d, col("doc_id"), col("text"))
          .where(col("keep")).select("doc_id"), "doc_id")),
      // grouping stage: bucket by the GROUP key so dup groups stay bucket-local
      CheckpointedRun.Stage("dedup", TextAnalysis.normalize(col("text")), 4, d =>
        Dedup.keepFirst(d, col("doc_id"), TextAnalysis.normalize(col("text")))),
      CheckpointedRun.Stage("decon", col("doc_id"), 4, d => {
        val corpus = d.where(col("doc_id") % 50 =!= 0)
        corpus.join(Dedup.decontaminate(corpus, col("doc_id"), col("text"),
            bench, col("doc_id"), col("text"), n = 3, minHits = 3)
          .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      }),
      CheckpointedRun.Stage("split", col("doc_id"), 4, d =>
        d.withColumn("bucket", TextAnalysis.hashBucket(col("doc_id"), "split-v1"))
          .withColumn("split", when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
          .select("doc_id", "split")))

    // the direct (q66-style lazy) chain — the rows the pipeline must match
    val kept = TextAnalysis.quality(docs, col("doc_id"), col("text"))
      .where(col("keep")).select("doc_id")
    val deduped = Dedup.keepFirst(docs.join(kept, "doc_id"),
      col("doc_id"), TextAnalysis.normalize(col("text"))).localCheckpoint()
    val corpus = deduped.where(col("doc_id") % 50 =!= 0)
    val direct = corpus.join(Dedup.decontaminate(corpus, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), n = 3, minHits = 3)
      .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .withColumn("bucket", TextAnalysis.hashBucket(col("doc_id"), "split-v1"))
      .withColumn("split", when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "val").otherwise("test"))
      .select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the planted shapes actually bite
    assert(!direct.exists(_._1 == 7L), "normalized dup must be dropped")
    assert(!direct.exists(_._1 == 3L), "quality-failed doc must be dropped")
    assert(!direct.exists(_._1 == 51L), "contaminated doc must be dropped")
    assert(direct.nonEmpty)

    // ---- crash injection: stages 1-2 complete, stage 3 dies after 2/4
    //      buckets, then a cold resume runs the WHOLE pipeline
    val root = freshDir("pipe")
    CheckpointedRun.runPipeline(spark, docs, stages.take(2), root, "jp")
    val s3 = stages(2)
    val stage2Out = spark.read.parquet(s"$root/dedup/data").drop("_bucket")
    CheckpointedRun.runAttempt(spark, stage2Out, s3.keyCol, s3.transform,
      s3.numBuckets, s"$root/decon", "jp.decon", maxBuckets = 2)
    def attempts(stage: String): Long = {
      val d = Paths.get(s"$root/$stage/_lineage")
      if (!Files.isDirectory(d)) 0L
      else Files.list(d).iterator().asScala.count(_.getFileName.toString.endsWith(".json")).toLong
    }
    val (a1, a2) = (attempts("quality"), attempts("dedup"))
    assert(CheckpointedRun.completedBuckets(s"$root/decon").size === 2)

    val resumed = CheckpointedRun.runPipeline(spark, docs, stages, root, "jp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(resumed === direct, "resumed pipeline must equal the direct q66 chain")
    // ZERO recompute of completed stages: no new attempt files appeared
    assert(attempts("quality") === a1 && attempts("dedup") === a2,
      "completed stages must not gain attempts on resume")
    // the crashed stage resumed with exactly one more attempt
    assert(attempts("decon") === 2L)

    // a second cold resume is a pure read — every stage complete, no new attempts
    val aSplit = attempts("split")
    val again = CheckpointedRun.runPipeline(spark, docs, stages, root, "jp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === direct)
    assert(attempts("decon") === 2L && attempts("split") === aSplit)
  }
}
