package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fixtures.{Fixtures, ImageCodec}
import graft.functions.GraftFunctions._
import graft.operators.SpatialJoin

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class FlagshipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val N = 10000

  test("flagship entry: spatial join + tile assignment returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("join row-set parity: distributed cover-join == brute-force shared kernel") {
    val imgs = Fixtures.images(spark, N)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val specs = Fixtures.polygons
    val got = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), specs)
      .select("image_id", "poly_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

    // brute-force oracle: same raycast kernel, every point × every polygon
    val pts = imgs.select("image_id", "lon", "lat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (id, lon, lat) <- pts.iterator
      s <- specs.iterator
      if s.poly.bbox.contains(lon, lat) && Raycast.contains(lon, lat, s.poly)
    } yield (id, s.poly_id)).toSet

    assert(got.size == want.size, s"got ${got.size} rows, want ${want.size}")
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce matches")
    // the dense-cluster fixture must exercise multiple polygons incl. adversarial
    assert(want.map(_._2).size >= 10, s"expected many polygons matched, got ${want.map(_._2)}")
  }

  test("tile assignment parity: expression == kernel, unique per point") {
    val imgs = Fixtures.images(spark, N)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val rows = SpatialJoin.assignTiles(imgs, col("lon"), col("lat"), 12)
      .select("image_id", "lon", "lat", "tile_x", "tile_y").collect()
    rows.foreach { r =>
      assert(r.getLong(3) == TileMath.equirectX(12, r.getLong(1)))
      assert(r.getLong(4) == TileMath.equirectY(12, r.getLong(2)))
    }
    // mercator variant sane: same x tiling, y in range
    val merc = SpatialJoin.assignTiles(imgs, col("lon"), col("lat"), 12, "mercator")
      .select("lon", "lat", "tile_x", "tile_y").limit(500).collect()
    merc.foreach { r =>
      assert(r.getLong(2) == TileMath.mercatorX(12, r.getLong(0) / 1e6))
      assert(r.getLong(3) == TileMath.mercatorY(12, r.getLong(1) / 1e6))
    }
  }

  test("image payload integrity: avgHash == phash, decode PSNR, caption determinism") {
    val rows = Fixtures.images(spark, 1000)
      .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash").collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      val w = r.getInt(2); val h = r.getInt(3); val fmt = r.getString(4)
      val px = ImageCodec.decode(bytes, fmt, w, h)
      assert(px.length == w * h)
      // phash is simultaneously the true average-hash of the pixels
      assert(ImageCodec.avgHash64(px, w, h) == r.getLong(6), s"row ${r.getString(0)}")
      // decode path: regenerate reference pixels, PSNR gate (∞ for lossless)
      val ref = ImageCodec.pixelsFromHash(r.getLong(6), w, h)
      assert(ImageCodec.psnr(px, ref) >= 40.0)
      // caption byte-determinism: regenerate from index
      val i = r.getString(0).stripPrefix("img").toLong
      assert(r.getString(5) == Fixtures.imageRow(i).caption)
    }
  }

  test("sf prefix property: first rows of a larger table equal the smaller table") {
    val small = Fixtures.images(spark, 1000).select("image_id", "phash", "caption")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val bigPrefix = Fixtures.images(spark, N)
      .filter(col("image_id") < f"img${1000L}%012d")
      .select("image_id", "phash", "caption")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(small == bigPrefix)
  }

  test("broadcast plan: cover join broadcasts the polygon side, no point-side shuffle") {
    val imgs = Fixtures.images(spark, 1000)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val df = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), Fixtures.polygons)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "point side must not shuffle in broadcast mode")
  }

  test("salted shuffle-join path produces identical row set") {
    val imgs = Fixtures.images(spark, 1000)
      .withColumn("lon", phashLon(col("phash")))
      .withColumn("lat", phashLat(col("phash")))
    val specs = Fixtures.polygons
    val base = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), specs)
      .select("image_id", "poly_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val salted = SpatialJoin.join(spark, imgs, col("lon"), col("lat"), specs,
      broadcastThreshold = 0, saltBuckets = 4)
      .select("image_id", "poly_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted == base)
  }

  test("manifest pruning: files outside the query cells are skipped") {
    Fixtures.images(spark, N) // ensure written
    val manifest = s"data/images_$N/_graft_manifest.json"
    assert(new java.io.File(manifest).exists())
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(manifest)))
    val total = "\"file\":".r.findAllIn(txt).length
    // a single-cell query must prune to a strict subset of files
    val one = graft.fixtures.Manifest.pruneFiles(manifest, Set(ZGrid.cellAt(12, 0L, 0L)))
    assert(total > 1 && one.size < total)
  }
}
