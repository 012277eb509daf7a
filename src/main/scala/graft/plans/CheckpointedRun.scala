package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Resumable partitioned execution with per-partition lineage + metrics
  * (BASELINE.json north_rule: "resumable from checkpoint with per-partition
  * lineage + metrics"; SURVEY.md §7.7).
  *
  * Model: the input is split into `numBuckets` deterministic buckets by a
  * key column (`pmod(hash(key), n)` — stable across runs and cluster
  * sizes). Each attempt processes the PENDING buckets (all − completed) in
  * one Spark job, writing output parquet partitioned by `_bucket` with
  * dynamic partition overwrite — so a bucket that failed mid-write is
  * replaced wholesale on retry (idempotent), and completed buckets are
  * never recomputed or rewritten.
  *
  * Lineage: `<out>/_lineage/attempt_*.json` holds one JSON line per bucket
  * per attempt — (job_id, attempt, partition_id, input_rows, output_rows,
  * t_start, t_end, status) — plus one `"kind":"metrics"` line per attempt
  * with SparkListener-sourced task metrics (records/bytes read, shuffle
  * bytes, executor CPU time). Files are written tmp→rename so a driver
  * kill mid-write never yields a half-manifest; an attempt that dies
  * before its manifest lands simply leaves its buckets pending.
  *
  * Scale: the bucket count bounds replay granularity, not parallelism —
  * within an attempt Spark parallelism is unconstrained; at 10^12 rows
  * you'd use O(10^4) buckets so a resume redoes ≤0.01% of work.
  */
object CheckpointedRun {

  final case class BucketResult(partitionId: Int, inputRows: Long, outputRows: Long)
  final case class RunReport(jobId: String, attempt: Int, processed: Seq[Int],
                             skipped: Seq[Int], output: DataFrame)

  private def lineageDir(outDir: String): Path = Paths.get(outDir, "_lineage")

  /** Buckets already completed ok in any prior attempt. */
  def completedBuckets(outDir: String): Set[Int] = {
    val dir = lineageDir(outDir)
    if (!Files.isDirectory(dir)) return Set.empty
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(l => l.contains("\"status\": \"ok\""))
      .flatMap(l => "\"partition_id\": (\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
      .toSet
  }

  def latestAttempt(outDir: String): Int = {
    val dir = lineageDir(outDir)
    if (!Files.isDirectory(dir)) return 0
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("attempt_") => s.stripPrefix("attempt_").takeWhile(_.isDigit).toInt }
      .foldLeft(0)(math.max)
  }

  /** One attempt: process up to `maxBuckets` pending buckets (all by
    * default). Returns the cumulative output (all completed buckets).
    * Call again after a crash — or with remaining buckets — to resume.
    */
  def runAttempt(spark: SparkSession, input: DataFrame, keyCol: Column,
                 transform: DataFrame => DataFrame, numBuckets: Int,
                 outDir: String, jobId: String,
                 maxBuckets: Int = Int.MaxValue): RunReport = {
    val done = completedBuckets(outDir)
    val attempt = latestAttempt(outDir) + 1
    val pendingAll = (0 until numBuckets).filterNot(done)
    val pending = pendingAll.take(maxBuckets)
    val dataDir = s"$outDir/data"

    if (pending.nonEmpty) {
      val tStart = System.currentTimeMillis()
      val metrics = new AttemptMetricsListener
      spark.sparkContext.addSparkListener(metrics)
      try {
        val bucketed = input.withColumn("_bucket", pmod(hash(keyCol), lit(numBuckets)))
          .where(col("_bucket").isInCollection(pending))
        // per-bucket input rows via an in-pipeline accumulator — the input is
        // scanned ONCE (the write job); the previous separate groupBy-count
        // was a full second read of the input per attempt. Caveat (doc'd): a
        // transform that scans its input k times records k×, and task
        // retries can over-count — lineage counts are observability
        // metadata; completion tracking never depends on them.
        val inAcc = new BucketCountAccumulator(numBuckets)
        spark.sparkContext.register(inAcc, s"graft.input_rows.$jobId.$attempt")
        val bIdx = bucketed.schema.fieldIndex("_bucket")
        val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(bucketed.schema)
        val counted = bucketed.mapPartitions { it =>
          it.map { r => inAcc.add(r.getInt(bIdx)); r }
        }(enc)
        val out0 = transform(counted)
        val out =
          if (out0.columns.contains("_bucket")) out0
          else
            // transform dropped _bucket — re-derive from the key if it
            // survived, else fail with a actionable message (the old
            // `withColumn("_bucket", col("_bucket"))` threw an opaque
            // AnalysisException here)
            try out0.withColumn("_bucket", pmod(hash(keyCol), lit(numBuckets)))
            catch {
              case e: org.apache.spark.sql.AnalysisException =>
                throw new IllegalArgumentException(
                  s"transform dropped both _bucket and the key column ($keyCol); " +
                    "keep one of them so rows stay attributable to buckets", e)
            }
        val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try out.write.mode("overwrite").partitionBy("_bucket").parquet(dataDir)
        finally prevMode match {
          case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        val inCounts = pending.map(b => b -> inAcc.value(b)).toMap
        // per-bucket output rows from parquet FOOTERS (driver metadata read,
        // O(files)) — the previous full re-read of the written data was 2×
        // write-side read amplification per attempt
        val outCounts = pending.map(b =>
          b -> parquetRowCount(spark, s"$dataDir/_bucket=$b")).toMap
        val tEnd = System.currentTimeMillis()
        val lines = pending.map { b =>
          s"""{"job_id": "$jobId", "attempt": $attempt, "partition_id": $b, """ +
            s""""input_rows": ${inCounts.getOrElse(b, 0L)}, "output_rows": ${outCounts.getOrElse(b, 0L)}, """ +
            s""""t_start": $tStart, "t_end": $tEnd, "status": "ok"}"""
        } :+ metrics.json(jobId, attempt)
        writeAtomic(lineageDir(outDir).resolve(f"attempt_$attempt%05d.json"),
          lines.mkString("", "\n", "\n"))
      } finally spark.sparkContext.removeSparkListener(metrics)
    }

    val output = spark.read.parquet(dataDir)
      .where(col("_bucket").isInCollection(completedBuckets(outDir).toSeq))
    RunReport(jobId, attempt, pending, done.toSeq.sorted, output)
  }

  /** Drive attempts until every bucket is complete; returns final output. */
  def runToCompletion(spark: SparkSession, input: DataFrame, keyCol: Column,
                      transform: DataFrame => DataFrame, numBuckets: Int,
                      outDir: String, jobId: String,
                      maxAttempts: Int = 10): DataFrame = {
    var r: RunReport = null
    var i = 0
    while (i < maxAttempts &&
           completedBuckets(outDir).size < numBuckets) {
      r = runAttempt(spark, input, keyCol, transform, numBuckets, outDir, jobId)
      i += 1
    }
    require(completedBuckets(outDir).size == numBuckets,
      s"job $jobId incomplete after $i attempts")
    r.output
  }

  /** One stage of a [[runPipeline]] chain. `keyCol` must make `transform`
    * BUCKET-LOCAL over the stage's input: row-wise stages take any stable
    * key; grouping stages must bucket by their GROUP key (e.g. an exact
    * dedup that groups on normalized text buckets by that normalized text),
    * so no group ever straddles a bucket boundary.
    */
  final case class Stage(name: String, keyCol: Column, numBuckets: Int,
                         transform: DataFrame => DataFrame)

  /** Multi-STAGE resumable pipeline: each stage is its own bucket-lineage
    * checkpoint under `<root>/<stage.name>`, and every stage output is a
    * real parquet boundary. A resume therefore (a) SKIPS fully complete
    * stages without scanning their inputs at all — the boundary parquet is
    * read directly, zero upstream recomputation (spec-asserted: completed
    * stages gain no new attempt files) — and (b) resumes the first
    * incomplete stage at bucket granularity. This is the composed q66
    * curation chain's deployment shape: at 100 TB each boundary is exactly
    * the "parquet write between stages" its lazy-composition note
    * prescribes, plus per-bucket lineage and crash-idempotent overwrite.
    */
  def runPipeline(spark: SparkSession, input: DataFrame, stages: Seq[Stage],
                  root: String, jobId: String): DataFrame = {
    var cur = input
    for (st <- stages) {
      val dir = s"$root/${st.name}"
      cur =
        if (completedBuckets(dir).size >= st.numBuckets)
          spark.read.parquet(s"$dir/data")
        else
          runToCompletion(spark, cur, st.keyCol, st.transform, st.numBuckets,
            dir, s"$jobId.${st.name}")
      // the stage's partition column must not leak into the next stage's
      // input (each stage buckets by its OWN key)
      cur = cur.drop("_bucket")
    }
    cur
  }

  /** Sum of parquet footer record counts under `dir` — metadata only, no
    * data pages touched. 0 for a missing dir (bucket produced no rows).
    */
  private def parquetRowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).iterator
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
  }

  private def writeAtomic(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Per-bucket row counter: a fixed-width Array[Long] accumulator (merge =
  * element-wise add) — O(numBuckets) driver state, no map boxing.
  */
final class BucketCountAccumulator(numBuckets: Int)
    extends org.apache.spark.util.AccumulatorV2[Int, Array[Long]] {
  private val counts = new Array[Long](numBuckets)
  override def isZero: Boolean = counts.forall(_ == 0L)
  override def copy(): BucketCountAccumulator = {
    val c = new BucketCountAccumulator(numBuckets)
    System.arraycopy(counts, 0, c.counts, 0, numBuckets)
    c
  }
  override def reset(): Unit = java.util.Arrays.fill(counts, 0L)
  override def add(v: Int): Unit = counts(v) += 1
  override def merge(other: org.apache.spark.util.AccumulatorV2[Int, Array[Long]]): Unit = {
    val o = other.value
    var i = 0
    while (i < numBuckets) { counts(i) += o(i); i += 1 }
  }
  override def value: Array[Long] = counts
}

/** Aggregates task metrics across the stages of one attempt. */
final class AttemptMetricsListener extends SparkListener {
  @volatile private var recordsRead = 0L
  @volatile private var bytesRead = 0L
  @volatile private var shuffleWrite = 0L
  @volatile private var cpuTimeNs = 0L
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      recordsRead += m.inputMetrics.recordsRead
      bytesRead += m.inputMetrics.bytesRead
      shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      cpuTimeNs += m.executorCpuTime
    }
  }
  def json(jobId: String, attempt: Int): String =
    s"""{"job_id": "$jobId", "attempt": $attempt, "kind": "metrics", """ +
      s""""records_read": $recordsRead, "bytes_read": $bytesRead, """ +
      s""""shuffle_write_bytes": $shuffleWrite, "executor_cpu_ns": $cpuTimeNs}"""
}
