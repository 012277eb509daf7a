package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics vs the batch engine on the same events. */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import EventStream._

  private def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val batch1 = Seq(
    Event(1, ts(0, 10), 1, "a", 1.0), Event(2, ts(0, 20), 1, "a", 2.0),
    Event(3, ts(0, 30), 2, "b", 5.0))
  private val batch2 = Seq(
    Event(4, ts(1, 10), 1, "a", 2.0), // unchanged value ⇒ NO_CHANGE
    Event(5, ts(1, 20), 2, "b", 6.0), // changed ⇒ VALUE_CHANGE
    Event(6, ts(1, 30), 3, "a", 9.0)) // new user ⇒ CREATION

  test("flatMapGroupsWithState contributions match batch-window semantics across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = contributions(mem.toDS())
      .writeStream.format("memory").queryName("contrib").outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("contrib")
        .select("event_id", "kind").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(
        1L -> "CREATION", 2L -> "VALUE_CHANGE", 3L -> "CREATION",
        4L -> "NO_CHANGE", 5L -> "VALUE_CHANGE", 6L -> "CREATION"))
    } finally q.stop()
  }

  test("typedContributions: full ContributionType enum incl. DELETION / TAG_CHANGE / re-creation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // user 1 exercises every arm; user 2 exercises tombstone-of-nothing
    val b1 = Seq(
      TaggedEvent(1, ts(0, 10), 1, "a", 1.0, "{k:1}"),     // CREATION
      TaggedEvent(2, ts(0, 20), 1, "a", 1.0, "{k:1}"),     // NO_CHANGE
      TaggedEvent(3, ts(0, 30), 1, "a", 2.0, "{k:1}"),     // VALUE_CHANGE
      TaggedEvent(4, ts(0, 40), 1, "a", 2.0, "{k:2}"),     // TAG_CHANGE
      TaggedEvent(8, ts(0, 10), 2, "error", 0.0, "{}"))    // tombstone of nothing
    val b2 = Seq(
      TaggedEvent(5, ts(0, 50), 1, "a", 3.0, "{k:3}"),     // TAG+VALUE (both)
      TaggedEvent(6, ts(1, 0), 1, "error", 0.0, "{}"),     // DELETION
      TaggedEvent(7, ts(1, 10), 1, "a", 9.0, "{k:1}"),     // re-CREATION
      TaggedEvent(9, ts(0, 20), 2, "error", 0.0, "{}"),    // tombstone again
      TaggedEvent(10, ts(0, 30), 2, "b", 1.0, "{k:1}"))    // CREATION after tombs
    val want = Map(
      1L -> "CREATION", 2L -> "NO_CHANGE", 3L -> "VALUE_CHANGE",
      4L -> "TAG_CHANGE", 5L -> "TAG_CHANGE+VALUE_CHANGE",
      6L -> "DELETION", 7L -> "CREATION",
      8L -> "NO_CHANGE", 9L -> "NO_CHANGE", 10L -> "CREATION")
    val mem = MemoryStream[TaggedEvent]
    val q = typedContributions(mem.toDS())
      .writeStream.format("memory").queryName("typed_contrib").outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("typed_contrib")
        .select("event_id", "kinds").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === want)
    } finally q.stop()
    // batch twin (the q6e kernel shape) classifies identically on the union
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val e = (b1 ++ b2).toDS().toDF()
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("prev_props", lag("props", 1).over(w))
    val tomb = col("event_type") === lit("error")
    val prevVisible = col("prev_type").isNotNull && col("prev_type") =!= lit("error")
    val batchGot = e.withColumn("kinds",
        when(tomb, when(prevVisible, lit("DELETION")).otherwise(lit("NO_CHANGE")))
          .when(!prevVisible, lit("CREATION"))
          .when(col("props") =!= col("prev_props") && col("value") =!= col("prev_value"),
            lit("TAG_CHANGE+VALUE_CHANGE"))
          .when(col("props") =!= col("prev_props"), lit("TAG_CHANGE"))
          .when(col("value") =!= col("prev_value"), lit("VALUE_CHANGE"))
          .otherwise(lit("NO_CHANGE")))
      .select("event_id", "kinds").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batchGot === want, "stream and batch classification must agree")
  }

  test("tumbling event-time counts equal the batch groupBy on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = tumblingCounts(mem.toDS().toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("tumbling")
        .select("w_start", "event_type", "cnt", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val exp = (batch1 ++ batch2).toDS().toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
        .select(col("window.start"), col("event_type"), col("cnt"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === exp)
    } finally q.stop()
  }

  test("streaming dedup drops cross-micro-batch re-deliveries within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = streamingDedup(mem.toDS().toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch1: _*); q.processAllAvailable() // exact re-delivery
      mem.addData(batch2: _*); q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L)) // each event once
    } finally q.stop()
  }

  test("iceberg sink: one snapshot per micro-batch, replayed batches skipped exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.IcebergLite
    val dir = java.nio.file.Files.createTempDirectory("iclite_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("iclite_ckpt").toString
    val mem = MemoryStream[(Long, Long)]
    val q = icebergSink(mem.toDS().toDF("id", "lonm"), dir, col("lonm"), "ingest", ckpt)
    try {
      mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      mem.addData((3L, 30L)); q.processAllAvailable()
      assert(IcebergLite.currentVersion(dir) === 2) // one snapshot per batch
      assert(IcebergLite.read(spark, dir).count() === 3)
      assert(IcebergLite.lastStreamBatch(dir, "ingest") === 1L)
    } finally q.stop()
    // crash-replay simulation: foreachBatch re-delivers an already-committed
    // batchId — the marker inside the snapshot chain makes it a no-op
    val writer = icebergBatchWriter(dir, col("lonm"), "ingest")
    writer(Seq((1L, 10L), (2L, 20L)).toDF("id", "lonm"), 1L)
    assert(IcebergLite.currentVersion(dir) === 2, "replayed batch must not re-commit")
    assert(IcebergLite.read(spark, dir).count() === 3)
    // a genuinely new batch still lands
    writer(Seq((4L, 40L)).toDF("id", "lonm"), 2L)
    assert(IcebergLite.currentVersion(dir) === 3)
    assert(IcebergLite.read(spark, dir).count() === 4)
    // markers don't collide across query names
    assert(IcebergLite.lastStreamBatch(dir, "other") === -1L)
  }

  test("branch WAP sink: micro-batches quarantine on a branch, publish is one commit, markers survive") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.IcebergLite
    val dir = java.nio.file.Files.createTempDirectory("iclite_wap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("iclite_wap_ck").toString
    // seeded main: ids 100..102
    IcebergLite.append(spark, dir,
      Seq((100L, 1L), (101L, 2L), (102L, 3L)).toDF("id", "lonm"), col("lonm"))
    IcebergLite.createBranch(dir, "ingest")
    val mainV = IcebergLite.currentVersion(dir)
    val mem = MemoryStream[(Long, Long)]
    val q = icebergBranchSink(mem.toDS().toDF("id", "lonm"), dir, "ingest",
      col("lonm"), "wap", ckpt)
    try {
      mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      mem.addData((3L, 30L)); q.processAllAvailable()
    } finally q.stop()
    // quarantine: main never saw a streamed row, branch has all of them
    assert(IcebergLite.currentVersion(dir) === mainV, "main must not move during ingest")
    assert(IcebergLite.read(spark, dir).count() === 3)
    assert(IcebergLite.readBranch(spark, dir, "ingest").count() === 6)
    assert(IcebergLite.lastBranchStreamBatch(dir, "ingest", "wap") === 1L)
    assert(IcebergLite.lastStreamBatch(dir, "wap") === -1L, "marker stays off main pre-publish")
    // crash-replay on the branch: committed batchId is a no-op
    val writer = icebergBranchBatchWriter(dir, "ingest", col("lonm"), "wap")
    val branchV = IcebergLite.branchHead(dir, "ingest")
    writer(Seq((1L, 10L), (2L, 20L)).toDF("id", "lonm"), 1L)
    assert(IcebergLite.branchHead(dir, "ingest") === branchV, "replayed batch must not re-commit")
    // main moves mid-audit (MoR delete of id=101) — publish must cherry-pick
    IcebergLite.deleteWhereMoR(spark, dir, col("id") === 101L, "id")
    IcebergLite.publishBranch(dir, "ingest")
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 100L, 102L))
    // the stream marker rode the cherry-pick: a replay against MAIN after
    // publish is still exactly-once
    assert(IcebergLite.lastStreamBatch(dir, "wap") === 1L)
  }

  test("branch WAP sink: a failed audit drops the branch and main never sees the window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.IcebergLite
    val dir = java.nio.file.Files.createTempDirectory("iclite_wap_bad").toString
    val ckpt = java.nio.file.Files.createTempDirectory("iclite_wap_bad_ck").toString
    IcebergLite.append(spark, dir, Seq((100L, 1L)).toDF("id", "lonm"), col("lonm"))
    IcebergLite.createBranch(dir, "bad")
    val mem = MemoryStream[(Long, Long)]
    val q = icebergBranchSink(mem.toDS().toDF("id", "lonm"), dir, "bad",
      col("lonm"), "wap_bad", ckpt)
    try { mem.addData((666L, -1L)); q.processAllAvailable() } finally q.stop()
    assert(IcebergLite.readBranch(spark, dir, "bad").count() === 2)
    IcebergLite.dropBranch(dir, "bad")
    assert(IcebergLite.read(spark, dir).collect().map(_.getLong(0)).toSeq === Seq(100L))
    intercept[Exception] { IcebergLite.readBranch(spark, dir, "bad") }
  }

  test("text curation ops run unchanged under Structured Streaming (stream == batch)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // quality + repetition are map-only codegen kernels, so the SAME
    // operator calls run on a readStream: prove streamed rows == batch rows
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog again today ok"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "x"),
      (4L, "a proper sentence with mixed words and enough tokens to pass the gate"))
    val mem = MemoryStream[(Long, String)]
    val streamed = TextAnalysis.repetition(
      TextAnalysis.quality(mem.toDS().toDF("doc_id", "text"),
        col("doc_id"), col("text")).where(col("keep"))
        .join(mem.toDS().toDF("doc_id", "text"), "doc_id"),
      col("doc_id"), col("text"))
    val q = streamed.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*); q.processAllAvailable()
      mem.addData(docs.drop(2): _*); q.processAllAvailable()
      val got = spark.table("curated")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(6))).toSet
      val batch = TextAnalysis.repetition(
        TextAnalysis.quality(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text")).where(col("keep"))
          .join(docs.toDF("doc_id", "text"), "doc_id"),
        col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(6))).toSet
      assert(got === batch)
      assert(got.exists(!_._3), "the spam doc must fail the repetition gate")
    } finally q.stop()
  }

  test("file-source stream over the driver events table produces rows") {
    // FileStreamSource wants a landing DIRECTORY; stage the single driver
    // file into one (read-only testdata stays untouched)
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      staged.resolve("events-0.parquet"))
    val dir = staged.toString
    val q = tumblingCounts(EventStream.readEventStream(spark, dir), "1 day", "2 days")
      .writeStream.format("memory").queryName("filestream").outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("filestream").count() > 0)
    } finally q.stop()
  }

  test("flagship spatial join + tiling runs under Structured Streaming (stream-static)") {
    // the whole flagship operator stack — phash decode, level-tagged cell
    // explode, broadcast cover join, codegen raycast refine, tile ids — is
    // narrow + stream-static-joinable, so it lifts to readStream unchanged;
    // streamed result must equal the batch run row-for-row
    import graft.functions.GraftFunctions._
    import graft.operators.SpatialJoin
    val batchImgs = graft.fixtures.Fixtures.images(spark, 2000)
    val staged = java.nio.file.Files.createTempDirectory("imgs_stream")
    batchImgs.coalesce(1).write.mode("overwrite").parquet(staged.toString)

    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val located = df.withColumn("lon", phashLon(col("phash")))
        .withColumn("lat", phashLat(col("phash")))
      SpatialJoin.assignTiles(
        SpatialJoin.join(spark, located, col("lon"), col("lat"),
          graft.fixtures.Fixtures.polygons),
        col("lon"), col("lat"), 12)
        .select("image_id", "poly_id", "tile_z", "tile_x", "tile_y")
    }
    val expect = pipeline(batchImgs).collect().map(_.toSeq).toSet

    val stream = spark.readStream.schema(batchImgs.schema).parquet(staged.toString)
    val q = pipeline(stream)
      .writeStream.format("memory").queryName("stream_tiling").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_tiling").collect().map(_.toSeq).toSet
      assert(got === expect)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streamingTrips: managed-state sessions equal the batch operator; trips span micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gapUs = 50L
    // entity 1: trip 0 = fixes at t 0/10/20 (SPANS b1/b2), trip 1 = t 100/120
    // entity 2: single-fix trip 0 at t 5, trip 1 = t 200/210
    // entity 7: fixes only in b2
    val b1 = Seq(Fix(1, 0, 1, 0, 0), Fix(1, 10, 2, 3, 4), Fix(2, 5, 3, 10, 10))
    val b2 = Seq(Fix(1, 20, 4, 6, 8), Fix(1, 100, 5, 0, 0), Fix(1, 120, 6, 5, 0),
      Fix(2, 200, 7, 0, 0), Fix(2, 210, 8, 0, 7), Fix(7, 300, 9, 1, 1))
    val real = b1 ++ b2
    val maxT = real.map(_.tus).max
    val flush = real.map(_.entity).distinct.map(e =>
      Fix(e, maxT + gapUs + 1, -1, 0, 0))

    val expect = graft.operators.Trajectory.trips(real.toDF(),
        col("entity"), col("tus"), col("oid"), col("lon"), col("lat"), gapUs)
      .collect().map(_.toSeq).toSet
    assert(expect.size == 5) // 2 + 2 + 1 trips

    val mem = MemoryStream[Fix]
    val q = streamingTrips(mem.toDS(), gapUs)
      .writeStream.format("memory").queryName("stream_trips").outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.table("stream_trips").count()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(flush: _*); q.processAllAvailable()
      val got = spark.table("stream_trips").collect().map(_.toSeq).toSet
      assert(got === expect)
      // nothing closed in b1 (both entities' first trips still open) — the
      // cross-batch state is doing the work, not per-batch recompute
      assert(afterB1 == 0)
    } finally q.stop()
  }

  test("streamingStayPoints: managed-state dwells equal the batch operator; runs span batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val g = 1000000L
    def cell(px: Long, py: Long) = (px * g - 180000000L + g / 2,
      py * g - 90000000L + g / 2)
    val home = cell(200, 100); val work = cell(210, 110)
    // entity 1: dwell at home t 0..40 (SPANS b1/b2: 3 then 2 fixes), move to
    // work for 3 fixes, back home (revisit = new stay)
    val b1 = Seq(Fix(1, 0, 1, home._1, home._2), Fix(1, 10, 2, home._1 + 9, home._2),
      Fix(1, 20, 3, home._1, home._2 + 9), Fix(2, 5, 4, work._1, work._2))
    val b2 = Seq(Fix(1, 30, 5, home._1, home._2), Fix(1, 40, 6, home._1 + 3, home._2),
      Fix(1, 50, 7, work._1, work._2), Fix(1, 60, 8, work._1 + 2, work._2),
      Fix(1, 75, 9, work._1, work._2 + 2),
      Fix(1, 80, 10, home._1, home._2), Fix(1, 95, 11, home._1, home._2 + 1),
      Fix(1, 99, 12, home._1 + 1, home._2),
      // entity 2: too few fixes per cell — never a stay
      Fix(2, 90, 13, home._1, home._2))
    val real = b1 ++ b2
    val flush = real.map(_.entity).distinct.map(e =>
      Fix(e, 1000L, -1, -179999999L, -89999999L))
    val expect = graft.operators.Trajectory.stayPoints(real.toDF(),
        col("entity"), col("tus"), col("oid"), col("lon"), col("lat"),
        g, minStayUs = 15L, minFixes = 3L)
      .collect().map(_.toSeq).toSet
    assert(expect.size == 3) // home run, work run, home revisit
    val mem = MemoryStream[Fix]
    val q = streamingStayPoints(mem.toDS(), g, minStayUs = 15L, minFixes = 3L)
      .writeStream.format("memory").queryName("stream_stays")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.table("stream_stays").count()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(flush: _*); q.processAllAvailable()
      val got = spark.table("stream_stays").collect().map(_.toSeq).toSet
      assert(got === expect)
      // the home dwell spans b1/b2 and closes only when the work fix
      // arrives in b2 — nothing can emit during b1
      assert(afterB1 == 0)
    } finally q.stop()
  }

  test("streamingGeofence: cross-batch inside-state equals batch transitions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val fences = Array((1L, 0L, 0L, 10000000L, 10000000L),
      (2L, 5000000L, 5000000L, 20000000L, 20000000L))
    // entity 1 ends b1 INSIDE fence 1; in b2 its first fix is still inside
    // (no event — state must remember), then exits 1 and enters 2
    val b1 = Seq(Fix(1, 10, 1, -5000000L, 0), Fix(1, 20, 2, 3000000L, 3000000L))
    val b2 = Seq(Fix(1, 30, 3, 4000000L, 4000000L),
      Fix(1, 40, 4, 15000000L, 15000000L),
      Fix(2, 35, 5, 6000000L, 6000000L)) // first fix inside BOTH
    val real = b1 ++ b2
    val expect = graft.operators.Trajectory.geofenceEvents(real.toDF(),
        col("entity"), col("tus"), col("oid"), col("lon"), col("lat"),
        fences.toSeq.toDF("fence_id", "lon_min", "lat_min", "lon_max", "lat_max"))
      .collect().map(_.toSeq).toSet
    assert(expect === Set(Seq(1L, 1L, 20L, 1L), Seq(1L, 1L, 40L, 0L),
      Seq(1L, 2L, 40L, 1L), Seq(2L, 1L, 35L, 1L), Seq(2L, 2L, 35L, 1L)))
    val mem = MemoryStream[Fix]
    val q = streamingGeofence(mem.toDS(), fences)
      .writeStream.format("memory").queryName("stream_fence")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      // the enter in b1 emits immediately (crossings are their own evidence)
      assert(spark.table("stream_fence").count() == 1)
      mem.addData(b2: _*); q.processAllAvailable()
      assert(spark.table("stream_fence").collect().map(_.toSeq).toSet === expect)
    } finally q.stop()
  }

  test("streamingHotspots: cross-batch counts ignite exactly once, on the crossing fix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val g = 1000000L
    def at(px: Long, py: Long) = (px * g - 180000000L + g / 2,
      py * g - 90000000L + g / 2)
    val a = at(50, 50); val b = at(60, 60); val c = at(70, 70)
    // cell a: crosses T=3 inside batch 1; cell b: 2 fixes in b1 + 1 in b2
    // (crosses on b2's first fix); cell c: never crosses
    val b1 = Seq(Fix(1, 0, 1, a._1, a._2), Fix(2, 1, 2, a._1 + 5, a._2),
      Fix(3, 2, 3, a._1, a._2 + 5), Fix(1, 3, 4, a._1, a._2), // 4th a fix
      Fix(1, 0, 5, b._1, b._2), Fix(2, 2, 6, b._1, b._2),
      Fix(9, 5, 7, c._1, c._2))
    val b2 = Seq(Fix(4, 10, 8, b._1 + 3, b._2), Fix(5, 11, 9, b._1, b._2),
      Fix(9, 12, 10, c._1, c._2))
    val mem = MemoryStream[Fix]
    val q = streamingHotspots(mem.toDS(), g, threshold = 3L)
      .writeStream.format("memory").queryName("stream_hot")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.table("stream_hot").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      // a ignites on its 3rd fix (tus 2, oid 3); b/c not yet
      assert(afterB1 === Set((50L, 50L, 2L, 3L, 3L)))
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("stream_hot").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      // b ignites on b2's FIRST b-cell fix (tus 10, oid 8) with cross-batch
      // count 2+1; a does NOT re-emit despite its 4th fix; c never fires
      assert(got === Set((50L, 50L, 2L, 3L, 3L), (60L, 60L, 10L, 8L, 3L)))
    } finally q.stop()
  }
}
