package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.ZGrid

class IcebergLiteSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def pts(lo: Long, n: Long) =
    (lo until lo + n).map(i => (i, i * 1000000L - 170000000L, (i % 160) * 1000000L - 80000000L))
      .toDF("id", "lonm", "latm")

  test("append creates snapshots; reads are version-isolated (time travel)") {
    val dir = Files.createTempDirectory("iclite").toString
    val key = org.apache.spark.sql.functions.expr("lonm") // stats col: lon
    val v1 = IcebergLite.append(spark, dir, pts(0, 100), key)
    val v2 = IcebergLite.append(spark, dir, pts(100, 50), key)
    assert(v1 === 1 && v2 === 2)
    assert(IcebergLite.read(spark, dir).count() === 150)
    assert(IcebergLite.read(spark, dir, asOfVersion = 1).count() === 100)
    // snapshot isolation: resolve v2, then append v3 — the resolved frame is fixed
    val resolved = IcebergLite.read(spark, dir)
    IcebergLite.append(spark, dir, pts(150, 25), key)
    assert(IcebergLite.currentVersion(dir) === 3)
    assert(resolved.count() === 150)
    assert(IcebergLite.read(spark, dir).count() === 175)
    // lineage chain recorded
    assert(IcebergLite.snapshot(dir, 3).parent === Some(2))
  }

  test("deleteWhere: copy-on-write, untouched files kept by reference, time travel intact") {
    val dir = Files.createTempDirectory("iclite3").toString
    val key = expr("lonm")
    // two appends → two data files with disjoint id ranges
    IcebergLite.append(spark, dir, pts(0, 100), key)
    IcebergLite.append(spark, dir, pts(1000, 100), key)
    val before = IcebergLite.snapshot(dir, 2).files
    // delete rows only in the SECOND batch (ids 1040..1049)
    val v3 = IcebergLite.deleteWhere(spark, dir, col("id").between(1040, 1049), key)
    assert(v3 === 3)
    val after = IcebergLite.snapshot(dir, 3).files
    // batch-1 files survive by reference (no rewrite)
    assert(before.map(_.path).toSet.intersect(after.map(_.path).toSet).nonEmpty,
      "untouched files must be reused, not rewritten")
    // current read excludes exactly the deleted rows
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size === 190)
    assert((1040L to 1049L).forall(i => !ids.contains(i)))
    // time travel: v2 still has all 200 rows; v1 has 100
    assert(IcebergLite.read(spark, dir, asOfVersion = 2).count() === 200)
    assert(IcebergLite.read(spark, dir, asOfVersion = 1).count() === 100)
    // deleting nothing is a no-op commit (version unchanged)
    assert(IcebergLite.deleteWhere(spark, dir, col("id") === 999999L, key) === 3)
    assert(IcebergLite.currentVersion(dir) === 3)
  }

  test("deleteWhere: NULL-predicate rows survive (DELETE removes only WHERE-TRUE rows)") {
    val dir = Files.createTempDirectory("iclite6").toString
    val key = expr("lonm")
    // one file mixing: a matching row (flag=1), non-matching rows (flag=0),
    // and NULL-flag rows — the DELETE predicate `flag = 1` is NULL on those,
    // and a naive `.where(!pred)` would silently drop them with the match
    val rows = Seq(
      (1L, 10L, 0L, Some(1L)), (2L, 20L, 0L, Some(0L)),
      (3L, 30L, 0L, None), (4L, 40L, 0L, None))
      .toDF("id", "lonm", "latm", "flag")
    IcebergLite.append(spark, dir, rows.repartition(1), key)
    IcebergLite.deleteWhere(spark, dir, col("flag") === 1L, key)
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L, 3L, 4L), s"NULL-predicate rows must survive, got $ids")
  }

  test("lastStreamBatch: O(1) lookup survives interleaved batch appends, per-stream") {
    val dir = Files.createTempDirectory("iclite7").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 10), key, streamMarker = Some(("ing", 0L)))
    // many plain batch appends AFTER the stream commit — the per-stream map
    // must ride forward so the lookup needs only the head snapshot
    (1 to 5).foreach(i => IcebergLite.append(spark, dir, pts(i * 100L, 10), key))
    IcebergLite.append(spark, dir, pts(900, 10), key, streamMarker = Some(("other", 7L)))
    assert(IcebergLite.lastStreamBatch(dir, "ing") === 0L)
    assert(IcebergLite.lastStreamBatch(dir, "other") === 7L)
    assert(IcebergLite.lastStreamBatch(dir, "missing") === -1L)
    // head snapshot alone carries the FULL map (the O(1) property itself)
    val head = IcebergLite.snapshot(dir, IcebergLite.currentVersion(dir))
    assert(head.streams === Map("ing" -> 0L, "other" -> 7L))
  }

  test("merge: upsert rewrites only matched files, inserts append, time travel intact") {
    val dir = Files.createTempDirectory("iclite5").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)
    IcebergLite.append(spark, dir, pts(1000, 100), key)
    val before = IcebergLite.snapshot(dir, 2).files
    // updates hit ONLY the second batch (ids 1010..1014, lonm sentinel),
    // plus a brand-new id 5000 (pure insert)
    val updates = ((1010L to 1014L).map(i => (i, 777L, 0L)) :+ ((5000L, 888L, 0L)))
      .toDF("id", "lonm", "latm")
    val v3 = IcebergLite.merge(spark, dir, updates, "id", key)
    assert(v3 === 3)
    val after = IcebergLite.snapshot(dir, 3).files
    // batch-1 files survive by reference
    assert(before.map(_.path).toSet.intersect(after.map(_.path).toSet).nonEmpty,
      "files without matched keys must be reused, not rewritten")
    val rows = IcebergLite.read(spark, dir).select("id", "lonm")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size === 201) // 200 original + 1 insert
    assert((1010L to 1014L).forall(i => rows(i) === 777L), "matched rows updated")
    assert(rows(5000L) === 888L, "unmatched update row inserted")
    assert(rows(1020L) === 1020L * 1000000L - 170000000L, "sibling rows in rewritten files survive")
    // time travel: pre-merge state intact
    assert(IcebergLite.read(spark, dir, asOfVersion = 2)
      .where(col("id") === 1010L).select("lonm").collect().head.getLong(0)
      === 1010L * 1000000L - 170000000L)
    // empty updates -> no-op commit
    assert(IcebergLite.merge(spark, dir, updates.limit(0), "id", key) === 3)
  }

  test("compact: bin-packs small files, keeps large by reference, rows identical, pruning tighter") {
    val dir = Files.createTempDirectory("iclite4").toString
    val key = expr("lonm")
    // one right-sized file (>= target) + 16 small files from micro-batch appends
    IcebergLite.append(spark, dir, pts(10000, 150).repartition(1), key)
    IcebergLite.append(spark, dir, pts(0, 100).repartition(8), key)
    IcebergLite.append(spark, dir, pts(100, 100).repartition(8), key)
    val before = IcebergLite.snapshot(dir, 3)
    assert(before.files.size === 17)
    val v4 = IcebergLite.compact(spark, dir, targetFileRows = 100L)
    assert(v4 === 4)
    val after = IcebergLite.snapshot(dir, 4)
    // 16 small files -> ceil(200/100) = 2; the large file survives BY REFERENCE
    assert(after.files.size === 3, s"got ${after.files.size} files")
    val largePath = before.files.find(_.rows >= 100L).get.path
    assert(after.files.map(_.path).contains(largePath), "large file must be kept by reference")
    // rows identical — compaction is pure layout maintenance
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === ((0L until 200L) ++ (10000L until 10150L)).toSet)
    // clustering: rewritten files have near-disjoint [min,max] stats ranges,
    // where the pre-compaction round-robin files all overlapped
    val rewritten = after.files.filterNot(_.path == largePath).sortBy(_.min)
    assert(rewritten.sliding(2).forall { case Seq(a, b) => a.max <= b.min; case _ => true },
      s"rewritten ranges must be disjoint: ${rewritten.map(f => (f.min, f.max))}")
    // time travel: pre-compaction layout intact
    assert(IcebergLite.read(spark, dir, asOfVersion = 3).count() === 350)
    // <2 small files -> no-op commit
    assert(IcebergLite.compact(spark, dir, targetFileRows = 100L) === 4)
  }

  test("stats pruning skips files outside the query cells") {
    val dir = Files.createTempDirectory("iclite2").toString
    val z = 8
    val cellCol = graft.functions.GraftFunctions.zcell(col("lonm"), col("latm"), z)
    // two widely-separated batches → disjoint cell ranges per file
    IcebergLite.append(spark, dir,
      (0L until 1000L).map(i => (i, -160000000L + i * 1000, -70000000L + (i % 50) * 1000))
        .toDF("id", "lonm", "latm").repartition(2), cellCol)
    IcebergLite.append(spark, dir,
      (1000L until 2000L).map(i => (i, 150000000L + (i % 100) * 1000, 60000000L + (i % 50) * 1000))
        .toDF("id", "lonm", "latm").repartition(2), cellCol)
    // query cells around the FIRST batch only
    val qcells = ZGrid.bboxCells(z, graft.core.BBoxM(-161000000L, -71000000L, -158000000L, -69000000L))
      .map { case (x, y) => graft.core.Morton.encode(x, y) }.toSet
    val (df, kept, total) = IcebergLite.pruneRead(spark, dir, qcells)
    assert(total >= 4 && kept < total, s"kept=$kept total=$total")
    val got = df.agg(count(lit(1)), min("id"), max("id")).collect().head
    assert(got.getLong(0) === 1000L) // exactly the first batch
    assert(got.getLong(2) < 1000L)
  }

  test("rewriteClustered: z-order sort rewrite turns zero-skip layouts into pruned scans; deletes fold") {
    val dir = Files.createTempDirectory("iclite_zorder").toString
    val z = 8
    val cellCol = graft.functions.GraftFunctions.zcell(col("lonm"), col("latm"), z)
    // 4000 points on a lon/lat lattice spanning the world, ingested
    // ROUND-ROBIN so every file's z-range spans ~everything
    val world = (0L until 4000L).map { i =>
      (i, (i % 80) * 4000000L - 160000000L, (i / 80) * 3000000L - 75000000L)
    }.toDF("id", "lonm", "latm").repartition(8)
    IcebergLite.append(spark, dir, world, cellCol)
    // a city-sized query bbox: cover cells at the same z level
    val qcells = ZGrid.bboxCells(z, graft.core.BBoxM(10000000L, 5000000L, 60000000L, 40000000L))
      .map { case (x, y) => graft.core.Morton.encode(x, y) }.toSet
    val (_, kept0, total0) = IcebergLite.pruneRead(spark, dir, qcells)
    assert(total0 === 8 && kept0 === total0, "scattered layout must skip nothing")
    // delete debt before the rewrite: the fold must apply it
    IcebergLite.deleteWhereMoR(spark, dir, col("id") % 100 === 7L, "id")
    val v = IcebergLite.rewriteClustered(spark, dir, cellCol, targetFileRows = 500L)
    val snap = IcebergLite.snapshot(dir, v)
    assert(snap.deletes.isEmpty, "rewrite must fold MoR delete debt")
    assert(snap.files.size === 8, "4000 rows / 500 target = 8 files")
    // rows identical to the logical table (4000 minus the 40 deleted)
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 4000L).filterNot(_ % 100 === 7L).toSet)
    // the same query now skips most files
    val (scan, kept1, total1) = IcebergLite.pruneRead(spark, dir, qcells)
    assert(total1 === 8 && kept1 <= 3, s"z-ordered layout must prune (kept=$kept1)")
    // pruned scan + exact filter == brute filter over the full table
    val exact = scan.where(col("lonm").between(10000000L, 60000000L) &&
                           col("latm").between(5000000L, 40000000L))
      .select("id").collect().map(_.getLong(0)).toSet
    val brute = IcebergLite.read(spark, dir)
      .where(col("lonm").between(10000000L, 60000000L) &&
             col("latm").between(5000000L, 40000000L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(exact === brute && exact.nonEmpty)
    // time travel still sees the pre-rewrite layout
    assert(IcebergLite.snapshot(dir, 1).files.size === 8)
    assert(IcebergLite.read(spark, dir, asOfVersion = 1).count() === 4000)
  }

  test("syncIncremental: bootstrap, exactly-once replay, append-only increments, rewrite raises") {
    val src = Files.createTempDirectory("iclite_sync_src").toString
    val dst = Files.createTempDirectory("iclite_sync_dst").toString
    val key = expr("lonm")
    IcebergLite.append(spark, src, pts(0, 100), key)
    IcebergLite.append(spark, src, pts(100, 50), key)
    // bootstrap: full source snapshot, marker = consumed src version
    val (dv1, sv1) = IcebergLite.syncIncremental(spark, src, dst, key, "rep")
    assert(dv1 === 1 && sv1 === 2L)
    assert(IcebergLite.read(spark, dst).count() === 150)
    assert(IcebergLite.lastStreamBatch(dst, "rep") === 2L)
    // replay (crash-recovery double call): provable no-op
    val (dv2, sv2) = IcebergLite.syncIncremental(spark, src, dst, key, "rep")
    assert(dv2 === 1 && sv2 === 2L)
    assert(IcebergLite.read(spark, dst).count() === 150)
    // increment ships only the new files' rows
    IcebergLite.append(spark, src, pts(150, 25), key)
    val (dv3, sv3) = IcebergLite.syncIncremental(spark, src, dst, key, "rep")
    assert(dv3 === 2 && sv3 === 3L)
    assert(IcebergLite.read(spark, dst).count() === 175)
    assert(IcebergLite.read(spark, dst).select("id").distinct().count() === 175)
    // two independent consumers keep independent checkpoints on their own dst
    val dst2 = Files.createTempDirectory("iclite_sync_dst2").toString
    IcebergLite.syncIncremental(spark, src, dst2, key, "rep")
    assert(IcebergLite.read(spark, dst2).count() === 175)
    // a rewrite window (compact) breaks append-only incremental: must raise
    IcebergLite.append(spark, src, pts(200, 10), key)
    IcebergLite.compact(spark, src, targetFileRows = 1000L)
    val e = intercept[IllegalArgumentException] {
      IcebergLite.syncIncremental(spark, src, dst, key, "rep")
    }
    assert(e.getMessage.contains("non-append"))
    // bootstrap of a FRESH consumer still works post-compact (full read)
    val dst3 = Files.createTempDirectory("iclite_sync_dst3").toString
    IcebergLite.syncIncremental(spark, src, dst3, key, "rep")
    assert(IcebergLite.read(spark, dst3).count() === 185)
  }

  test("readBbox: pruned region read == full-scan filter, incl. a seam-crossing bbox") {
    val dir = Files.createTempDirectory("iclite_bbox").toString
    val z = 8
    val cellCol = graft.functions.GraftFunctions.zcell(col("lonm"), col("latm"), z)
    val world = (0L until 3000L).map { i =>
      (i, (i % 75) * 4000000L - 150000000L, (i / 75) * 3000000L - 60000000L)
    }.toDF("id", "lonm", "latm")
    IcebergLite.append(spark, dir, world, cellCol)
    IcebergLite.rewriteClustered(spark, dir, cellCol, targetFileRows = 400L)
    val bbox = graft.core.BBoxM(20000000L, 10000000L, 70000000L, 45000000L)
    val (df, kept, total) = IcebergLite.readBbox(spark, dir, bbox, z, "lonm", "latm")
    assert(kept < total, s"region read must skip files (kept=$kept of $total)")
    val brute = IcebergLite.read(spark, dir)
      .where(col("lonm").between(20000000L, 70000000L) &&
             col("latm").between(10000000L, 45000000L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(df.select("id").collect().map(_.getLong(0)).toSet === brute && brute.nonEmpty)
    // seam-crossing: lonMin > lonMax reads both world edges
    val seam = graft.core.BBoxM(140000000L, 0L, -140000000L, 30000000L)
    val (sdf, _, _) = IcebergLite.readBbox(spark, dir, seam, z, "lonm", "latm")
    val sBrute = IcebergLite.read(spark, dir)
      .where((col("lonm") >= 140000000L || col("lonm") <= -140000000L) &&
             col("latm").between(0L, 30000000L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sdf.select("id").collect().map(_.getLong(0)).toSet === sBrute && sBrute.nonEmpty)
  }

  test("syncCdcMirror: ordered delete/re-append replication, schema evolution, replay, raises") {
    val src = Files.createTempDirectory("iclite_cdcm_src").toString
    val dst = Files.createTempDirectory("iclite_cdcm_dst").toString
    val key = expr("lonm")
    IcebergLite.append(spark, src, pts(0, 100), key) // v1
    IcebergLite.syncCdcMirror(spark, src, dst, key, "cdc") // bootstrap
    assert(IcebergLite.read(spark, dst).count() === 100)
    IcebergLite.deleteWhereMoR(spark, src, col("id") % 10 === 7L, "id") // v2
    IcebergLite.append(spark, src, pts(100, 50), key)                  // v3
    IcebergLite.addColumn(spark, src, "flag", "BIGINT")                // v4
    IcebergLite.append(spark, src, pts(150, 10), key)                  // v5 (flag null)
    // v6: RE-APPEND the ids v2 deleted — the ordering case a naive
    // all-inserts-then-all-deletes replay gets wrong
    IcebergLite.append(spark, src,
      (0L until 100L).filter(_ % 10 == 7L)
        .map(i => (i, i * 1000000L - 170000000L, (i % 160) * 1000000L - 80000000L))
        .toDF("id", "lonm", "latm"), key)
    val (dv, sv) = IcebergLite.syncCdcMirror(spark, src, dst, key, "cdc")
    assert(sv === 6L)
    val got = IcebergLite.read(spark, dst)
    // all 160 ids present (deleted ids restored by the ordered re-append)
    assert(got.select("id").collect().map(_.getLong(0)).toSet === (0L until 160L).toSet)
    // schema evolution propagated; old rows read the new column as null
    assert(got.columns.contains("flag"))
    assert(got.where(col("flag").isNotNull).count() === 0)
    // mirror == source, row for row
    val s0 = IcebergLite.read(spark, src).select("id", "lonm", "flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d0 = got.select("id", "lonm", "flag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d0 === s0)
    // replay: provable no-op
    val before = IcebergLite.currentVersion(dst)
    assert(IcebergLite.syncCdcMirror(spark, src, dst, key, "cdc")._1 === before)
    assert(IcebergLite.currentVersion(dst) === before)
    // position deletes cannot be mirrored — raise with the caveat
    IcebergLite.deleteWhereMoRPos(spark, src, col("id") === 0L) // v7
    val e = intercept[IllegalArgumentException] {
      IcebergLite.syncCdcMirror(spark, src, dst, key, "cdc")
    }
    assert(e.getMessage.contains("POSITION"))
    // CoW rewrite windows raise too (fresh mirror, compact on source)
    val src2 = Files.createTempDirectory("iclite_cdcm_src2").toString
    val dst2 = Files.createTempDirectory("iclite_cdcm_dst2").toString
    IcebergLite.append(spark, src2, pts(0, 10), key)
    IcebergLite.syncCdcMirror(spark, src2, dst2, key, "cdc")
    IcebergLite.append(spark, src2, pts(10, 10), key)
    IcebergLite.compact(spark, src2, targetFileRows = 100L)
    val e2 = intercept[IllegalArgumentException] {
      IcebergLite.syncCdcMirror(spark, src2, dst2, key, "cdc")
    }
    assert(e2.getMessage.contains("rewrites"))
  }

  test("readChanges: added-file rows between snapshots; raises across rewrites") {
    val dir = Files.createTempDirectory("iclite_chg").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)
    IcebergLite.append(spark, dir, pts(100, 50), key)
    IcebergLite.append(spark, dir, pts(150, 25), key)
    val chg = IcebergLite.readChanges(spark, dir, fromVersion = 1)
    assert(chg.count() === 75)
    assert(chg.agg(min("id")).collect().head.getLong(0) === 100L)
    // window of one append
    assert(IcebergLite.readChanges(spark, dir, 2, 3).count() === 25)
    // same-version window = empty, no crash
    assert(IcebergLite.readChanges(spark, dir, 3, 3).collect().isEmpty)
    // a CoW rewrite inside the window must raise, not return wrong rows
    IcebergLite.deleteWhere(spark, dir, col("id") < 10, key)
    val e = intercept[IllegalArgumentException] {
      IcebergLite.readChanges(spark, dir, 1, 4)
    }
    assert(e.getMessage.contains("non-append"))
    // but a window that starts AFTER the rewrite works again
    IcebergLite.append(spark, dir, pts(200, 5), key)
    assert(IcebergLite.readChanges(spark, dir, 4, 5).count() === 5)
  }

  test("expireSnapshots: orphan files physically deleted, retained window intact") {
    val dir = Files.createTempDirectory("iclite_exp").toString
    val key = expr("lonm")
    (0 until 4).foreach(i => IcebergLite.append(spark, dir, pts(i * 100L, 100), key))
    IcebergLite.compact(spark, dir, targetFileRows = 1000L) // v5 rewrites all 4 small files
    import scala.jdk.CollectionConverters._
    def dataFiles() = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    val before = dataFiles()
    val (expired, deleted) = IcebergLite.expireSnapshots(dir, retainLast = 1)
    assert(expired === 4, "v1..v4 expire")
    assert(deleted > 0, "pre-compaction files are orphans of the expired window")
    assert(dataFiles() < before)
    // current read unchanged
    assert(IcebergLite.read(spark, dir).count() === 400)
    // expired versions no longer travel
    intercept[Exception] { IcebergLite.read(spark, dir, asOfVersion = 2).count() }
    // retainLast covering everything is a no-op
    val dir2 = Files.createTempDirectory("iclite_exp2").toString
    IcebergLite.append(spark, dir2, pts(0, 10), key)
    IcebergLite.append(spark, dir2, pts(10, 10), key)
    assert(IcebergLite.expireSnapshots(dir2, retainLast = 5) === ((0, 0)))
    // kept-by-reference safety: delete rewrites ONE file, the other files are
    // shared between v1-era and current — expire must not delete shared files
    val dir3 = Files.createTempDirectory("iclite_exp3").toString
    (0 until 3).foreach(i => IcebergLite.append(spark, dir3, pts(i * 100L, 100), key))
    IcebergLite.deleteWhere(spark, dir3, col("id") === 0L, key) // touches batch-0 file only
    IcebergLite.expireSnapshots(dir3, retainLast = 1)
    assert(IcebergLite.read(spark, dir3).count() === 299)
  }

  test("deleteWhereMoR: no data-file rewrite, read anti-merges, compact folds") {
    val dir = Files.createTempDirectory("iclite_mor").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)
    IcebergLite.append(spark, dir, pts(1000, 100), key)
    val before = IcebergLite.snapshot(dir, 2)
    val v3 = IcebergLite.deleteWhereMoR(spark, dir, col("id").between(1040, 1049), "id")
    assert(v3 === 3)
    val after = IcebergLite.snapshot(dir, 3)
    // merge-on-read: the DATA file list is byte-identical — only a delete file landed
    assert(after.files.map(_.path) === before.files.map(_.path),
      "MoR delete must not rewrite any data file")
    assert(after.deletes.nonEmpty && after.deletes.forall(_.key == "id"))
    assert(after.deletes.map(_.rows).sum === 10)
    // scan-time anti-merge
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size === 190)
    assert((1040L to 1049L).forall(i => !ids.contains(i)))
    // time travel to the pre-delete snapshot still sees all rows
    assert(IcebergLite.read(spark, dir, asOfVersion = 2).count() === 200)
    // no-match delete is a no-op commit
    assert(IcebergLite.deleteWhereMoR(spark, dir, col("id") === 999999L, "id") === 3)
    // sequence semantics: re-appending a DELETED key after the delete survives
    IcebergLite.append(spark, dir, pts(1045, 1), key) // id=1045 was deleted at v3
    val ids2 = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toList
    assert(ids2.count(_ == 1045L) === 1, "row appended AFTER the delete must survive")
    assert(IcebergLite.read(spark, dir).count() === 191)
    // compact folds the delete debt: no delete entries survive, rows identical
    val rowsBefore = IcebergLite.read(spark, dir).orderBy("id", "lonm").collect().toSeq
    val vC = IcebergLite.compact(spark, dir, targetFileRows = 1000L)
    val folded = IcebergLite.snapshot(dir, vC)
    assert(folded.deletes.isEmpty, "compaction must fold merge-on-read deletes")
    assert(IcebergLite.read(spark, dir).orderBy("id", "lonm").collect().toSeq === rowsBefore)
  }

  test("deleteWhereMoRPos: position deletes — no key column, no rewrite, compact folds") {
    val dir = Files.createTempDirectory("iclite_pos").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)
    IcebergLite.append(spark, dir, pts(1000, 100), key)
    val before = IcebergLite.snapshot(dir, 2)
    // predicate over a NON-key column — the case equality deletes can't
    // serve without materializing keys
    val v3 = IcebergLite.deleteWhereMoRPos(spark, dir, col("latm") < -75000000L)
    assert(v3 === 3)
    val after = IcebergLite.snapshot(dir, 3)
    assert(after.files.map(_.path) === before.files.map(_.path),
      "position delete must not rewrite any data file")
    assert(after.deletes.nonEmpty && after.deletes.forall(_.key == "#pos"))
    val expectDead = (0L until 100L).count(i => (i % 160) * 1000000L - 80000000L < -75000000L) +
      (1000L until 1100L).count(i => (i % 160) * 1000000L - 80000000L < -75000000L)
    assert(after.deletes.map(_.rows).sum === expectDead)
    assert(IcebergLite.read(spark, dir).count() === 200 - expectDead)
    assert(IcebergLite.read(spark, dir).where(col("latm") < -75000000L).count() === 0)
    // time travel pre-delete intact
    assert(IcebergLite.read(spark, dir, asOfVersion = 2).count() === 200)
    // no-match is a no-op commit
    assert(IcebergLite.deleteWhereMoRPos(spark, dir, col("id") === 999999L) === 3)
    // sequence rule for free: a BYTE-IDENTICAL re-append survives (its file
    // postdates the delete, so no (file,pos) pair can name it)
    IcebergLite.append(spark, dir, pts(0, 5), key) // ids 0..4, latm < -75M
    assert(IcebergLite.read(spark, dir).where(col("latm") < -75000000L).count() === 5)
    // mixed generations: an equality delete on top of the position delete
    IcebergLite.deleteWhereMoR(spark, dir, col("id") === 50L, "id")
    val rowsBefore = IcebergLite.read(spark, dir).orderBy("id", "lonm").collect().toSeq
    assert(!rowsBefore.exists(_.getLong(0) == 50L))
    // compact folds BOTH kinds of delete debt
    val vC = IcebergLite.compact(spark, dir, targetFileRows = 1000L)
    assert(IcebergLite.snapshot(dir, vC).deletes.isEmpty,
      "compaction must fold position deletes")
    assert(IcebergLite.read(spark, dir).orderBy("id", "lonm").collect().toSeq === rowsBefore)
  }

  test("readChangesCdc restores full-content delete rows for position deletes") {
    val dir = Files.createTempDirectory("iclite_pos_cdc").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 60), key)                   // v1
    IcebergLite.append(spark, dir, pts(100, 40), key)                 // v2
    IcebergLite.deleteWhereMoRPos(spark, dir, col("id") % 10 === 3)   // v3
    val chg = IcebergLite.readChangesCdc(spark, dir, 1, 3)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dels = chg.filter(_._2 == "delete").map(_._1).sorted
    assert(dels.toSeq === ((0L until 60L) ++ (100L until 140L)).filter(_ % 10 == 3))
    val ins = chg.filter(_._2 == "insert").map(_._1).sorted
    assert(ins.toSeq === (100L until 140L)) // window inserts = v2's append
  }

  test("deleteWhereMoR then CoW verbs: deletes survive partial rewrites correctly") {
    val dir = Files.createTempDirectory("iclite_mor2").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)     // file A
    IcebergLite.append(spark, dir, pts(1000, 100), key)  // file B
    // MoR-delete rows in BOTH files
    IcebergLite.deleteWhereMoR(spark, dir, col("id").isin(5L, 1005L), "id")
    assert(IcebergLite.read(spark, dir).count() === 198)
    // CoW delete touching only file B rewrites it WITH the MoR delete applied
    // (no resurrection), and keeps the delete entry for file A
    IcebergLite.deleteWhere(spark, dir, col("id") === 1010L, key)
    val snap = IcebergLite.snapshot(dir, IcebergLite.currentVersion(dir))
    assert(snap.deletes.nonEmpty, "delete entry must survive while file A predates it")
    val ids = IcebergLite.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(5L) && !ids.contains(1005L) && !ids.contains(1010L))
    assert(ids.size === 197)
  }

  test("addColumn: metadata-only evolution, null backfill, per-snapshot schema travel") {
    val dir = Files.createTempDirectory("iclite_evo").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 50), key) // v1: (id, lonm, latm)
    val v2 = IcebergLite.addColumn(spark, dir, "score", "DOUBLE")
    assert(v2 === 2)
    // metadata-only: same data files
    assert(IcebergLite.snapshot(dir, 2).files.map(_.path) ===
      IcebergLite.snapshot(dir, 1).files.map(_.path))
    // old files read back with the column null-backfilled
    val evolved = IcebergLite.read(spark, dir)
    assert(evolved.columns.toSeq === Seq("id", "lonm", "latm", "score"))
    assert(evolved.where(col("score").isNull).count() === 50)
    // new append carries real values
    val withScore = pts(100, 10).withColumn("score", col("id").cast("double") / 2)
    IcebergLite.append(spark, dir, withScore, key)
    val cur = IcebergLite.read(spark, dir)
    assert(cur.count() === 60)
    assert(cur.where(col("score").isNotNull).count() === 10)
    // mixed-file scan across the evolution boundary aggregates fine
    assert(cur.agg(sum("score")).collect()(0).getDouble(0) ===
      (100L until 110L).map(_.toDouble / 2).sum)
    // time travel: v1 reads under its OWN schema — no score column
    assert(!IcebergLite.read(spark, dir, asOfVersion = 1).columns.contains("score"))
    // appending with an unknown column is rejected (addColumn first)
    intercept[IllegalArgumentException] {
      IcebergLite.append(spark, dir, pts(0, 1).withColumn("bogus", lit(1)), key)
    }
    // duplicate column rejected
    intercept[IllegalArgumentException] { IcebergLite.addColumn(spark, dir, "score", "DOUBLE") }
  }

  test("empty snapshots read as empty frames with schema (no files.head crash)") {
    val dir = Files.createTempDirectory("iclite_empty").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 10), key)
    // CoW-delete EVERY row — the snapshot has zero data files
    IcebergLite.deleteWhere(spark, dir, lit(true), key)
    val empty = IcebergLite.read(spark, dir)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("id", "lonm", "latm"))
    // incremental scan over the empty window doesn't crash either
    assert(IcebergLite.readChanges(spark, dir, 2, 2).count() === 0)
    // and appending into the empty table works
    IcebergLite.append(spark, dir, pts(50, 5), key)
    assert(IcebergLite.read(spark, dir).count() === 5)
  }

  test("maintenance survives table paths containing spaces") {
    val base = Files.createTempDirectory("iclite sp ace")
    val dir = base.toString
    val key = expr("lonm")
    (0 until 3).foreach(i => IcebergLite.append(spark, dir, pts(i * 100L, 50), key))
    IcebergLite.compact(spark, dir, targetFileRows = 1000L)
    // expire walks + deletes normalized paths — must not throw URISyntaxException
    val (expired, deleted) = IcebergLite.expireSnapshots(dir, retainLast = 1)
    assert(expired === 3 && deleted > 0)
    assert(IcebergLite.read(spark, dir).count() === 150)
    assert(IcebergLite.readChanges(spark, dir, 4, 4).count() === 0)
  }

  test("readChanges raises when a merge-on-read delete landed in the window") {
    val dir = Files.createTempDirectory("iclite_morchg").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 50), key)
    IcebergLite.deleteWhereMoR(spark, dir, col("id") === 3L, "id")
    IcebergLite.append(spark, dir, pts(100, 10), key)
    val e = intercept[IllegalArgumentException] {
      IcebergLite.readChanges(spark, dir, 1, 3)
    }
    assert(e.getMessage.contains("merge-on-read"))
    // a window after the delete is clean again
    assert(IcebergLite.readChanges(spark, dir, 2, 3).count() === 10)
  }

  test("rollbackTo: metadata-only restore; schema travel; timestamp travel") {
    val dir = Files.createTempDirectory("iclite_rb").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 40), key)              // v1
    IcebergLite.append(spark, dir, pts(100, 20), key)            // v2
    val dataFiles = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.toArray.map(_.toString).filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    IcebergLite.deleteWhereMoR(spark, dir, col("id") % 4 === 1, "id") // v3 (bad)
    assert(IcebergLite.rollbackTo(dir, 2) === 4)
    // the restored state IS v2's: same rows, and NO new data file was
    // written by the rollback (delete files from v3 remain on disk for the
    // still-travelable v3, but v4 references none of them)
    assert(IcebergLite.read(spark, dir).count() === 60)
    assert(IcebergLite.snapshot(dir, 4).deletes.isEmpty)
    assert(IcebergLite.snapshot(dir, 4).files.map(_.path).sorted ===
      IcebergLite.snapshot(dir, 2).files.map(_.path).sorted)
    // v3 stays travelable until expiration (forensics contract)
    assert(IcebergLite.read(spark, dir, asOfVersion = 3).count() === 45)
    // writes continue on the restored line
    IcebergLite.deleteWhereMoR(spark, dir, col("id") === 100L, "id") // v5
    assert(IcebergLite.read(spark, dir).count() === 59)
    // rollback across an addColumn restores the PRE-evolution schema
    IcebergLite.addColumn(spark, dir, "grade", "INT")            // v6
    assert(IcebergLite.read(spark, dir).columns.contains("grade"))
    IcebergLite.rollbackTo(dir, 5)                               // v7
    assert(!IcebergLite.read(spark, dir).columns.contains("grade"))
    // timestamp travel: strictly monotonic commit ts, exact boundaries
    val ts = (1 to 7).map(v => IcebergLite.snapshot(dir, v).ts)
    assert(ts === ts.sorted && ts.distinct.size === 7, "strictly monotonic")
    assert(IcebergLite.versionAt(dir, ts(1)) === 2)        // exactly at v2
    assert(IcebergLite.versionAt(dir, ts(2) - 1) === 2)    // just before v3
    assert(IcebergLite.versionAt(dir, ts(6) + 1000) === 7) // after the last
    assert(IcebergLite.readAt(spark, dir, ts(2)).count() === 45)
    val e0 = intercept[IllegalArgumentException] {
      IcebergLite.versionAt(dir, ts(0) - 1) // predates the table
    }
    assert(e0.getMessage.contains("no retained snapshot"))
    // incremental readers raise across a rollback that undid a delete
    // (v3's delete generation vanishes at v4 — its rows silently return,
    // so changelog attribution is undefined over that window)
    val e1 = intercept[IllegalArgumentException] {
      IcebergLite.readChangesCdc(spark, dir, 2, 4)
    }
    assert(e1.getMessage.contains("rollback"))
    // ... but a window whose net row change is genuinely empty (addColumn
    // + schema-only rollback, v5→v7) reads as zero events
    assert(IcebergLite.readChangesCdc(spark, dir, 5, 7).count() === 0)
    // data-file inventory: rollbacks + MoR deletes wrote ZERO data files
    // beyond the two appends' (delete-key files live under data/ too, so
    // count only the files any snapshot references as DATA files)
    val refd = (1 to 7).flatMap(v => IcebergLite.snapshot(dir, v).files.map(_.path)).toSet
    assert(refd.subsetOf(dataFiles),
      "no snapshot references a data file that did not exist after v2")
  }

  test("write-audit-publish: staged invisible, fast-forward + cherry-pick publish") {
    val dir = Files.createTempDirectory("iclite_wap").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 40), key)                // v1 main
    val staged = IcebergLite.stageAppend(spark, dir, pts(100, 20), key) // v2 STAGED
    assert(staged === 2)
    // stage is invisible to the main table but auditable by version
    assert(IcebergLite.currentVersion(dir) === 1)
    assert(IcebergLite.read(spark, dir).count() === 40)
    assert(IcebergLite.read(spark, dir, asOfVersion = staged).count() === 60)
    // FAST-FORWARD publish: main did not move → pointer swing, NO new snapshot
    val metaCount = Files.list(java.nio.file.Paths.get(dir, "metadata")).count()
    assert(IcebergLite.publish(dir, staged) === staged)
    assert(IcebergLite.currentVersion(dir) === staged)
    assert(IcebergLite.read(spark, dir).count() === 60)
    assert(Files.list(java.nio.file.Paths.get(dir, "metadata")).count() === metaCount)
    // double publish raises (cherry-picking it again would duplicate rows)
    val e0 = intercept[IllegalArgumentException](IcebergLite.publish(dir, staged))
    assert(e0.getMessage.contains("already on the main chain"))
    // CHERRY-PICK publish: main moves (MoR delete) while a new stage audits
    val staged2 = IcebergLite.stageAppend(spark, dir, pts(200, 10), key) // v3 STAGED
    IcebergLite.deleteWhereMoR(spark, dir, col("id") % 10 === 3, "id") // v4 main
    assert(IcebergLite.currentVersion(dir) === 4)
    val pub = IcebergLite.publish(dir, staged2)                     // v5 main
    assert(pub === 5 && IcebergLite.currentVersion(dir) === 5)
    // the in-audit delete removed the %10==3 rows of v2's state (6 of them);
    // cherry-picked files are re-sequenced AFTER the delete, so id=203 survives
    assert(IcebergLite.read(spark, dir).count() === 60 - 6 + 10)
    assert(IcebergLite.read(spark, dir).where(col("id") === 203L).count() === 1)
    assert(IcebergLite.read(spark, dir).where(col("id") === 3L).count() === 0)
    // parent lineage: the cherry-pick commit sits on main with parent v4
    assert(IcebergLite.snapshot(dir, 5).parent === Some(4))
    // a stage over an OLD schema can't cherry-pick across an evolution
    val staged3 = IcebergLite.stageAppend(spark, dir, pts(300, 5), key)  // v6 STAGED
    IcebergLite.addColumn(spark, dir, "grade", "INT")               // v7 main
    val e1 = intercept[IllegalArgumentException](IcebergLite.publish(dir, staged3))
    assert(e1.getMessage.contains("schema changed on main"))
  }

  test("staged snapshots: invisible to CDC / timestamp travel; reclaimed by expiration") {
    val dir = Files.createTempDirectory("iclite_wap2").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 30), key)            // v1 main
    IcebergLite.stageAppend(spark, dir, pts(100, 10), key)          // v2 staged, ABANDONED
    IcebergLite.append(spark, dir, pts(200, 20), key)          // v3 main (parent v1)
    assert(IcebergLite.snapshot(dir, 3).parent === Some(1))
    // CDC walks the parent chain: the abandoned stage contributes nothing
    val chg = IcebergLite.readChangesCdc(spark, dir, 1)
      .collect().map(r => r.getLong(r.fieldIndex("id"))).sorted.toSeq
    assert(chg === (200L until 220L))
    // timestamp travel never resolves to a staged version
    assert(IcebergLite.versionAt(dir, IcebergLite.snapshot(dir, 1).ts) === 1)
    assert(IcebergLite.versionAt(dir, IcebergLite.snapshot(dir, 3).ts + 1000) === 3)
    // expiration: retention counts MAIN commits; the abandoned stage below
    // the cutoff is reclaimed — manifest dropped AND its files deleted
    IcebergLite.append(spark, dir, pts(300, 5), key)           // v4 main
    val stagedFiles = IcebergLite.snapshot(dir, 2).files.map(_.path)
      .filterNot(IcebergLite.snapshot(dir, 1).files.map(_.path).toSet)
    assert(stagedFiles.nonEmpty)
    val (expired, deleted) = IcebergLite.expireSnapshots(dir, retainLast = 2)
    assert(expired === 2) // v1 (main, past window) and v2 (abandoned stage)
    assert(stagedFiles.forall(p => !Files.exists(java.nio.file.Paths.get(p))))
    assert(deleted >= stagedFiles.size)
    // v1's files survive — v3/v4 still hold them by reference
    assert(IcebergLite.read(spark, dir).count() === 55)
    assert(IcebergLite.read(spark, dir, asOfVersion = 3).count() === 50)
  }

  test("readChangesCdc: inserts + MoR-delete rows with full content; CoW raises") {
    val dir = Files.createTempDirectory("iclite_cdc").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 50), key)             // v1
    IcebergLite.append(spark, dir, pts(100, 30), key)           // v2
    IcebergLite.deleteWhereMoR(spark, dir,
      col("id").isin(3L, 105L), "id")                           // v3
    IcebergLite.append(spark, dir, pts(200, 10), key)           // v4
    val chg = IcebergLite.readChangesCdc(spark, dir, 1)
      .select("id", "lonm", "_change_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val ins = ((100L until 130L) ++ (200L until 210L))
      .map(i => (i, i * 1000000L - 170000000L, "insert")).toSet
    // both deleted rows carry FULL row content, including id=3 which lives
    // in a file appended BEFORE the window started
    val del = Set(3L, 105L).map(i => (i, i * 1000000L - 170000000L, "delete"))
    assert(chg === (ins ++ del))
    // a row appended AND deleted inside the window emits both events
    val dir2 = Files.createTempDirectory("iclite_cdc2").toString
    IcebergLite.append(spark, dir2, pts(0, 10), key)            // v1
    IcebergLite.append(spark, dir2, pts(50, 10), key)           // v2
    IcebergLite.deleteWhereMoR(spark, dir2, col("id") === 55L, "id") // v3
    val both = IcebergLite.readChangesCdc(spark, dir2, 1)
      .where(col("id") === 55L).select("_change_type")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(both === Seq("delete", "insert"))
    // CoW rewrite in the window still raises
    IcebergLite.deleteWhere(spark, dir2, col("id") === 51L, key) // v4 rewrite
    val e = intercept[IllegalArgumentException] {
      IcebergLite.readChangesCdc(spark, dir2, 1)
    }
    assert(e.getMessage.contains("copy-on-write"))
    // changelog parity with table states: v_from rows + inserts − deletes
    // == v_to rows (checked on the first table)
    val v1Rows = IcebergLite.read(spark, dir, asOfVersion = 1).count()
    val v4Rows = IcebergLite.read(spark, dir, asOfVersion = 4).count()
    val nIns = chg.count(_._3 == "insert"); val nDel = chg.count(_._3 == "delete")
    assert(v1Rows + nIns - nDel === v4Rows)
  }

  test("metadata tables: history/snapshots/files/deletes/refs reflect the verb chain") {
    val dir = Files.createTempDirectory("iclite_meta").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 60), key)                   // v1
    IcebergLite.append(spark, dir, pts(100, 40), key)                 // v2
    IcebergLite.deleteWhereMoR(spark, dir, col("id") % 10 === 3, "id") // v3 (10 keys)
    IcebergLite.deleteWhereMoRPos(spark, dir, col("id") === 7L)       // v4 (1 pos)
    IcebergLite.tag(dir, "pin", 2)
    IcebergLite.stageAppend(spark, dir, pts(500, 5), key)             // v5 STAGED
    // history: main chain only, newest first, counters exact
    val h = IcebergLite.historyTable(spark, dir)
      .select("version", "data_rows", "delete_files", "delete_rows", "is_current")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(h.toSeq === Seq((4, 100L, 2, 11L, true), (3, 100L, 1, 10L, false),
      (2, 100L, 0, 0L, false), (1, 60L, 0, 0L, false)))
    // snapshots: the staged v5 appears with on_main = false
    val sn = IcebergLite.snapshotsTable(spark, dir)
      .select("version", "on_main").collect().map(r => (r.getInt(0), r.getBoolean(1)))
    assert(sn.toSeq === Seq((1, true), (2, true), (3, true), (4, true), (5, false)))
    // files: row counts sum to the table size; seq recorded
    val f = IcebergLite.filesTable(spark, dir)
    assert(f.agg(sum("rows")).head.getLong(0) === 100L)
    assert(f.select("seq").distinct().collect().map(_.getInt(0)).toSet === Set(1, 2))
    // deletes: one equality generation (key=id), one position generation
    val d = IcebergLite.deletesTable(spark, dir)
      .select("kind", "key", "rows").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2))).sortBy(_._1)
    assert(d.toSeq === Seq(("equality", Some("id"), 10L), ("position", None, 1L)))
    // refs: the tag row
    val refs = IcebergLite.refsTable(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(refs.toSeq === Seq(("pin", "tag", 2)))
    // composes with SQL like any DataFrame
    IcebergLite.deletesTable(spark, dir).createOrReplaceTempView("t_deletes")
    assert(spark.sql("SELECT CAST(sum(rows) AS BIGINT) FROM t_deletes").head.getLong(0) === 11L)
  }

  test("tags: immutable pins, survive mutation AND expiration, drop releases") {
    val dir = Files.createTempDirectory("iclite_tag").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 40), key)                 // v1
    assert(IcebergLite.tag(dir, "train-v1") === 1)
    // mutate past the tag: delete + append + compact (CoW rewrites v1 files)
    IcebergLite.deleteWhere(spark, dir, col("id") % 4 === 0, key)   // v2
    IcebergLite.append(spark, dir, pts(100, 10), key)               // v3
    IcebergLite.compact(spark, dir)                                 // v4 (maybe)
    // the tag still reads EXACTLY the v1 corpus
    assert(IcebergLite.readTag(spark, dir, "train-v1").count() === 40)
    assert(IcebergLite.tagVersion(dir, "train-v1") === 1)
    // immutable: re-tagging raises
    val e = intercept[IllegalArgumentException](IcebergLite.tag(dir, "train-v1", 3))
    assert(e.getMessage.contains("immutable"))
    // expiration with retainLast=1 drops every old MAIN snapshot EXCEPT the
    // tagged one — manifest and data files both survive
    val (expired, _) = IcebergLite.expireSnapshots(dir, retainLast = 1)
    assert(expired > 0)
    assert(IcebergLite.readTag(spark, dir, "train-v1").count() === 40)
    // intermediate untagged snapshots are gone
    assert(intercept[Exception](
      IcebergLite.read(spark, dir, asOfVersion = 2)).isInstanceOf[Exception])
    // dropTag releases the pin: the next expiration reclaims v1
    IcebergLite.dropTag(dir, "train-v1")
    assert(IcebergLite.listTags(dir).isEmpty)
    val (expired2, _) = IcebergLite.expireSnapshots(dir, retainLast = 1)
    assert(expired2 === 1)
    val e2 = intercept[Exception](IcebergLite.read(spark, dir, asOfVersion = 1))
    assert(e2 != null)
  }

  test("branches: staged multi-commit chain, fast-forward and cherry-pick publish") {
    val dir = Files.createTempDirectory("iclite_br").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 30), key)                 // v1 main
    IcebergLite.createBranch(dir, "ingest")                         // at v1
    val b1 = IcebergLite.appendToBranch(spark, dir, "ingest", pts(100, 10), key) // v2
    val b2 = IcebergLite.appendToBranch(spark, dir, "ingest", pts(200, 5), key)  // v3
    assert(b1 === 2 && b2 === 3 && IcebergLite.branchHead(dir, "ingest") === 3)
    assert(IcebergLite.snapshot(dir, 3).parent === Some(2))
    // branch content visible on the branch, invisible on main
    assert(IcebergLite.readBranch(spark, dir, "ingest").count() === 45)
    assert(IcebergLite.read(spark, dir).count() === 30)
    assert(IcebergLite.currentVersion(dir) === 1)
    // FAST-FORWARD: main still at the fork → pointer swing to the head
    assert(IcebergLite.publishBranch(dir, "ingest") === 3)
    assert(IcebergLite.currentVersion(dir) === 3)
    assert(IcebergLite.read(spark, dir).count() === 45)
    // second branch; main moves (MoR delete) during its audit → CHERRY-PICK
    IcebergLite.createBranch(dir, "ingest2")                        // at v3
    IcebergLite.appendToBranch(spark, dir, "ingest2", pts(300, 8), key)  // v4
    IcebergLite.appendToBranch(spark, dir, "ingest2", pts(400, 2), key)  // v5
    IcebergLite.deleteWhereMoR(spark, dir, col("id") === 7L, "id")  // v6 main
    val pub = IcebergLite.publishBranch(dir, "ingest2")             // v7 main
    assert(pub === 7 && IcebergLite.currentVersion(dir) === 7)
    // all branch rows survive the in-audit delete (re-sequenced after it)
    assert(IcebergLite.read(spark, dir).count() === 45 - 1 + 10)
    assert(IcebergLite.snapshot(dir, 7).parent === Some(6))
    // branch heads are expiration-protected until dropped
    IcebergLite.append(spark, dir, pts(500, 1), key)                // v8
    IcebergLite.createBranch(dir, "wip", from = 3)
    IcebergLite.expireSnapshots(dir, retainLast = 1)
    assert(IcebergLite.readBranch(spark, dir, "wip").count() === 45)
    assert(IcebergLite.listBranches(dir).keySet === Set("ingest", "ingest2", "wip"))
  }

  test("renameColumn: metadata-only; old files read-mapped; time travel shows old name") {
    val dir = Files.createTempDirectory("iclite_ren").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)              // v1: lonm
    val filesBefore = IcebergLite.snapshot(dir, 1).files.map(_.path).toSet
    IcebergLite.renameColumn(spark, dir, "lonm", "lon_micro")     // v2
    // zero data files touched
    assert(IcebergLite.snapshot(dir, 2).files.map(_.path).toSet === filesBefore)
    // values ride the rename: old files answer under the new name
    val got = IcebergLite.read(spark, dir)
    assert(got.columns.contains("lon_micro") && !got.columns.contains("lonm"))
    assert(got.where(col("lon_micro").isNull).count() === 0)
    assert(got.agg(sum("lon_micro")).head.getLong(0) ===
      (0L until 100L).map(_ * 1000000L - 170000000L).sum)
    // appends after the rename write the new name physically; both epochs union
    IcebergLite.append(spark, dir,
      pts(100, 50).withColumnRenamed("lonm", "lon_micro"), expr("lon_micro")) // v3
    assert(IcebergLite.read(spark, dir).where(col("lon_micro").isNull).count() === 0)
    assert(IcebergLite.read(spark, dir).count() === 150)
    // time travel to v1 shows the ORIGINAL name
    assert(IcebergLite.read(spark, dir, asOfVersion = 1).columns.contains("lonm"))
    // chained rename keeps mapping old files
    IcebergLite.renameColumn(spark, dir, "lon_micro", "x")        // v4
    assert(IcebergLite.read(spark, dir).agg(sum("x")).head.getLong(0) ===
      (0L until 150L).map(_ * 1000000L - 170000000L).sum)
    // guard: renaming a column with outstanding MoR delete debt refuses
    IcebergLite.deleteWhereMoR(spark, dir, col("id") === 1L, "id")
    val e = intercept[IllegalArgumentException] {
      IcebergLite.renameColumn(spark, dir, "id", "ident")
    }
    assert(e.getMessage.contains("compact"))
  }

  test("dropColumn + re-add: dropped data never resurrects; rollback restores it") {
    val dir = Files.createTempDirectory("iclite_drop").toString
    val key = expr("lonm")
    IcebergLite.append(spark, dir, pts(0, 100), key)              // v1: id,lonm,latm
    IcebergLite.dropColumn(spark, dir, "latm")                    // v2 (metadata-only)
    val afterDrop = IcebergLite.read(spark, dir)
    assert(!afterDrop.columns.contains("latm"))
    assert(afterDrop.count() === 100)
    // re-add the SAME name: pre-re-add files must read NULL, not old bytes
    IcebergLite.addColumn(spark, dir, "latm", "BIGINT")           // v3
    val readd = IcebergLite.read(spark, dir)
    assert(readd.columns.contains("latm"))
    assert(readd.where(col("latm").isNotNull).count() === 0)
    // new appends fill it; old rows stay null
    IcebergLite.append(spark, dir, pts(100, 50), key)             // v4
    val mixed = IcebergLite.read(spark, dir)
    assert(mixed.where(col("latm").isNotNull).count() === 50)
    assert(mixed.count() === 150)
    // time travel: v1 shows the original values
    assert(IcebergLite.read(spark, dir, asOfVersion = 1)
      .where(col("latm").isNull).count() === 0)
    // rollback to v1 restores the ORIGINAL column line (ledger truncated:
    // the v3 re-add must not null the restored files)
    IcebergLite.rollbackTo(dir, 1)                                // v5
    val restored = IcebergLite.read(spark, dir)
    assert(restored.count() === 100)
    assert(restored.where(col("latm").isNull).count() === 0)
    // compact folds the evolution debt: one epoch, values preserved
    val dir2 = Files.createTempDirectory("iclite_drop2").toString
    IcebergLite.append(spark, dir2, pts(0, 40), key)
    IcebergLite.dropColumn(spark, dir2, "latm")
    IcebergLite.addColumn(spark, dir2, "latm", "BIGINT")
    IcebergLite.append(spark, dir2, pts(40, 10), key)
    IcebergLite.compact(spark, dir2, targetFileRows = 1000L)
    val folded = IcebergLite.read(spark, dir2)
    assert(folded.count() === 50 && folded.where(col("latm").isNotNull).count() === 10)
  }
}
