package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Hand-built "Iceberg-shaped" table format (SURVEY.md A1): no Iceberg jar
  * ships in this sandbox, so the metadata layer an Iceberg table would
  * provide is implemented directly —
  *
  *   <table>/data/<uuid>/part-*.parquet      immutable data files
  *   <table>/metadata/v00001.json …          snapshot per version:
  *       {version, snapshot_id, parent, files:[{path, rows, min, max}]}
  *   <table>/metadata/_current                pointer file (tmp→rename)
  *
  * giving the three Iceberg properties the engine relies on:
  *   - snapshot isolation: readers resolve a version once and see an
  *     immutable file list (appends create a NEW version);
  *   - time travel: `read(dir, asOfVersion = n)`;
  *   - file-level stats pruning: each file carries min/max of a stats
  *     column (the zcell(12) clustering key for the images table), and
  *     `pruneRead` keeps only files whose range intersects the query cells.
  *
  * Commits are atomic via tmp-write + rename of the pointer; concurrent
  * appends would need a CAS on `_current` (single-writer here, noted).
  */
object IcebergLite {
  final case class FileEntry(path: String, rows: Long, min: Long, max: Long)
  /** `streams` carries the LATEST committed batchId per stream name, merged
    * forward at every commit — so exactly-once lookup is O(1) metadata reads
    * (one snapshot JSON), not a parent-chain walk that degrades to
    * O(versions) on tables mixing batch appends with streaming.
    */
  final case class Snapshot(version: Int, snapshotId: String, parent: Option[Int],
                            files: Seq[FileEntry],
                            streams: Map[String, Long] = Map.empty)

  private def metaDir(dir: String): Path = Paths.get(dir, "metadata")

  def currentVersion(dir: String): Int = {
    val p = metaDir(dir).resolve("_current")
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  def snapshot(dir: String, version: Int): Snapshot = {
    val txt = new String(Files.readAllBytes(
      metaDir(dir).resolve(f"v$version%05d.json")), StandardCharsets.UTF_8)
    val entry = """\{"path": "([^"]+)", "rows": (\d+), "min": (-?\d+), "max": (-?\d+)\}""".r
    val files = entry.findAllMatchIn(txt).map(m =>
      FileEntry(m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)).toSeq
    val sid = """"snapshot_id": "([^"]+)"""".r.findFirstMatchIn(txt).get.group(1)
    val parent = """"parent": (\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    val streams = """"stream:([^"]+)": (-?\d+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    Snapshot(version, sid, parent, files, streams)
  }

  /** Highest streaming batchId committed for `name`, or -1. The per-stream
    * map is merged forward at every commit (batch appends included), so this
    * is ONE snapshot-JSON read regardless of table history length — and the
    * marker still rides inside the atomic commit, so there is no window
    * where data landed but the marker didn't.
    */
  def lastStreamBatch(dir: String, name: String): Long = {
    val v = currentVersion(dir)
    if (v <= 0) -1L else snapshot(dir, v).streams.getOrElse(name, -1L)
  }

  /** Row counts + `_stats` long-column min/max per file, read from parquet
    * footers only (no data pages touched).
    */
  private def footerStats(spark: SparkSession, dataDir: String): Seq[FileEntry] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try {
          var rows = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          r.getFooter.getBlocks.asScala.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala.foreach { c =>
              if (c.getPath.toDotString == "_stats") {
                val s = c.getStatistics.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
                if (s.hasNonNullValue) {
                  if (s.getMin < mn) mn = s.getMin
                  if (s.getMax > mx) mx = s.getMax
                }
              }
            }
          }
          FileEntry(f.getPath.toString, rows, mn, mx)
        } finally r.close()
      }
  }

  /** Append `df` as a new snapshot; `statsCol` supplies per-file min/max
    * (pass the clustering key). Returns the new version number.
    */
  def append(spark: SparkSession, dir: String, df: DataFrame, statsCol: Column,
             streamMarker: Option[(String, Long)] = None): Int = {
    val cur = currentVersion(dir)
    val old = if (cur > 0) snapshot(dir, cur).files else Seq.empty
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    df.withColumn("_stats", statsCol)
      .write.mode("error").parquet(dataDir)
    // per-file stats from the parquet FOOTERS the write just produced
    // (row counts + `_stats` column min/max) — a metadata-only driver read,
    // exactly how an Iceberg commit collects manifests; the previous
    // implementation re-READ the whole batch per append (write-side read
    // amplification at scale)
    val stats = footerStats(spark, dataDir)
    commitSnapshot(dir, cur, old ++ stats, streamMarker)
  }

  /** Copy-on-write row-level DELETE (the Iceberg verb the dedup pipeline
    * ends in — "drop these near-duplicate rows"): rewrites ONLY the data
    * files that contain matching rows (one pushdown-filtered scan finds
    * them), producing a new snapshot that keeps every untouched file
    * by reference. Old versions stay time-travelable — the rewritten
    * files are new objects, nothing is mutated in place.
    *
    * Returns the new version, or the current version unchanged when no
    * row matches (no empty commit).
    *
    * At scale: match detection is a predicate-pushdown scan (parquet
    * row-group stats prune most files when the predicate correlates with
    * the clustering key), and the rewrite reads/writes only touched files —
    * the same write amplification profile as Iceberg's copy-on-write mode.
    */
  def deleteWhere(spark: SparkSession, dir: String, predicate: Column,
                  statsCol: Column): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    def norm(p: String): String = new java.net.URI(p).getPath
    val touched = spark.read.parquet(snap.files.map(_.path): _*)
      .where(predicate)
      .select(input_file_name().as("_f")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    if (touched.isEmpty) return cur
    val (rewrite, keep) = snap.files.partition(f => touched.contains(norm(f.path)))
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    // DELETE semantics: remove only rows where the predicate IS TRUE. A
    // nullable predicate evaluates to NULL on some rows; !NULL is NULL which
    // `where` drops — so the naive `.where(!predicate)` would silently delete
    // NULL-predicate rows that share a file with a true match. Keep every row
    // where the predicate is not TRUE.
    spark.read.parquet(rewrite.map(_.path): _*)
      .where(not(coalesce(predicate, lit(false))))
      .withColumn("_stats", statsCol)
      .write.mode("error").parquet(dataDir)
    val files = keep ++ footerStats(spark, dataDir)
    commitSnapshot(dir, cur, files)
  }

  /** Copy-on-write MERGE/upsert by key (Iceberg's `MERGE INTO … WHEN MATCHED
    * THEN UPDATE WHEN NOT MATCHED THEN INSERT` in its copy-on-write mode):
    * every row of `updates` lands in the new snapshot — replacing any
    * existing row with the same `key`, or as a new row. Only the data files
    * that CONTAIN a matching key are rewritten (their non-matching rows are
    * kept, matching rows dropped — the update row itself arrives with the
    * freshly-written updates batch); every untouched file survives by
    * reference, and old versions still time-travel.
    *
    * At scale: match detection is one pushdown-filtered semi-join scan with
    * the (dim-sized) update keyset broadcast, the rewrite reads/writes only
    * touched files, and the updates batch is a plain append — the same
    * write-amplification profile as deleteWhere, plus one small write.
    *
    * Returns the new version; `updates.isEmpty` is a no-op (no empty commit).
    * Caller contract: `updates` must be key-unique — duplicate keys in the
    * batch all land (this layer does not pick a winner; dedupe upstream,
    * e.g. keepFirst, exactly as Iceberg's MERGE rejects multi-matches).
    */
  def merge(spark: SparkSession, dir: String, updates: DataFrame, key: String,
            statsCol: Column): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    if (updates.isEmpty) return cur
    val snap = snapshot(dir, cur)
    def norm(p: String): String = new java.net.URI(p).getPath
    val updKeys = updates.select(col(key)).distinct()
    val touched = spark.read.parquet(snap.files.map(_.path): _*)
      .select(col(key), input_file_name().as("_f"))
      .join(broadcast(updKeys), key, "left_semi")
      .select("_f").distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    val (rewrite, keep) = snap.files.partition(f => touched.contains(norm(f.path)))
    val survivors =
      if (rewrite.isEmpty) updates
      else spark.read.parquet(rewrite.map(_.path): _*).drop("_stats")
        .join(broadcast(updKeys), key, "left_anti")
        .unionByName(updates)
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    survivors.withColumn("_stats", statsCol)
      .write.mode("error").parquet(dataDir)
    commitSnapshot(dir, cur, keep ++ footerStats(spark, dataDir))
  }

  /** Compaction + clustering rewrite (Iceberg's `rewrite_data_files` with
    * the bin-pack/sort strategy): data files smaller than `targetFileRows`
    * are read back, range-partitioned and sorted on the `_stats`
    * clustering key they already carry, and rewritten as
    * ceil(rows/targetFileRows) right-sized files; files already at target
    * size are kept BY REFERENCE. The new snapshot sees identical rows —
    * compaction is pure layout maintenance — while per-file [min,max]
    * ranges become near-disjoint, so `pruneRead` keeps fewer files for
    * the same query cells (spec-gated). Old versions still time-travel to
    * the pre-compaction layout; nothing is mutated in place.
    *
    * At scale this is the standard small-file problem verb: many
    * micro-batch appends → one range-shuffle of only the small-file
    * subset (large files never rewritten ⇒ write amplification bounded
    * by the small fraction), metadata from footers only.
    *
    * Returns the new version, or the current one when <2 files qualify.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileRows: Long = 1L << 20): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val (small, keep) = snap.files.partition(_.rows < targetFileRows)
    if (small.size < 2) return cur
    val totalRows = small.map(_.rows).sum
    val outFiles = math.max(1L, (totalRows + targetFileRows - 1) / targetFileRows).toInt
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    spark.read.parquet(small.map(_.path): _*)
      .repartitionByRange(outFiles, col("_stats"))
      .sortWithinPartitions(col("_stats"))
      .write.mode("error").parquet(dataDir)
    commitSnapshot(dir, cur, keep ++ footerStats(spark, dataDir))
  }

  /** Snapshot expiration + orphan-file removal (Iceberg's
    * `expire_snapshots` / `remove_orphan_files` maintenance pair): retain
    * the last `retainLast` versions, drop every older snapshot JSON, and
    * physically delete data files referenced ONLY by expired snapshots.
    * Files a retained snapshot still references (kept-by-reference across
    * compact/delete/merge rewrites) are never touched, so reads and time
    * travel WITHIN the retained window are unaffected; travel past it now
    * fails — that is the verb's contract (history is bounded so storage
    * is: without it, every CoW rewrite strands its old files forever).
    *
    * Returns (expired snapshot count, deleted data-file count). At scale
    * both walks are metadata-only (snapshot JSONs); deletes are per-file
    * driver calls exactly like Iceberg's maintenance action.
    */
  def expireSnapshots(dir: String, retainLast: Int = 2): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val oldestRetained = math.max(1, cur - retainLast + 1)
    if (oldestRetained == 1) return (0, 0)
    def norm(p: String): String = new java.net.URI(p).getPath
    val retained = (oldestRetained to cur)
      .flatMap(v => snapshot(dir, v).files.map(f => norm(f.path))).toSet
    var deletedFiles = 0
    var expired = 0
    (1 until oldestRetained).foreach { v =>
      snapshot(dir, v).files.foreach { f =>
        val p = Paths.get(norm(f.path))
        if (!retained.contains(norm(f.path)) && Files.deleteIfExists(p))
          deletedFiles += 1
      }
      Files.deleteIfExists(metaDir(dir).resolve(f"v$v%05d.json"))
      expired += 1
    }
    (expired, deletedFiles)
  }

  /** Incremental append scan (Iceberg's incremental read contract): the
    * rows of data files ADDED between `fromVersion` (exclusive) and
    * `toVersion` (inclusive) — the "what arrived since I last looked"
    * verb a downstream batch consumer polls instead of re-scanning the
    * table. Mirrors Iceberg's restriction: if any `fromVersion` file is
    * GONE at `toVersion`, a rewrite (delete/merge/compact) happened in
    * the window and added-files no longer mean appended-rows — raise
    * rather than return wrong increments.
    *
    * Metadata-only planning: two snapshot JSON reads, file-set difference.
    */
  def readChanges(spark: SparkSession, dir: String,
                  fromVersion: Int, toVersion: Int = -1): DataFrame = {
    val to = if (toVersion > 0) toVersion else currentVersion(dir)
    require(fromVersion >= 1 && to >= fromVersion,
      s"need 1 <= fromVersion <= toVersion, got $fromVersion..$to")
    def norm(p: String): String = new java.net.URI(p).getPath
    val fromFiles = snapshot(dir, fromVersion).files.map(f => norm(f.path)).toSet
    val toSnap = snapshot(dir, to)
    val toFiles = toSnap.files.map(f => norm(f.path)).toSet
    val removed = fromFiles -- toFiles
    require(removed.isEmpty,
      s"non-append change between v$fromVersion and v$to (${removed.size} file(s) " +
        "rewritten/removed) — incremental read is only defined over append snapshots")
    val added = toSnap.files.filter(f => !fromFiles.contains(norm(f.path)))
    if (added.isEmpty)
      spark.read.parquet(toSnap.files.head.path).drop("_stats").limit(0)
    else spark.read.parquet(added.map(_.path): _*).drop("_stats")
  }

  private def commitSnapshot(dir: String, parentVersion: Int, files: Seq[FileEntry],
                             streamMarker: Option[(String, Long)] = None): Int = {
    val version = parentVersion + 1
    val sid = java.util.UUID.randomUUID().toString
    val body = files.map(f =>
      s"""    {"path": "${f.path}", "rows": ${f.rows}, "min": ${f.min}, "max": ${f.max}}""")
      .mkString("[\n", ",\n", "\n  ]")
    val parent = if (parentVersion > 0) s""",\n  "parent": $parentVersion""" else ""
    // merge the per-stream latest-batch map forward so EVERY snapshot carries
    // the full map and lastStreamBatch is O(1) metadata reads
    val parentStreams =
      if (parentVersion > 0) snapshot(dir, parentVersion).streams else Map.empty[String, Long]
    val streams = parentStreams ++ streamMarker.toMap
    val marker =
      if (streams.isEmpty) ""
      else streams.toSeq.sortBy(_._1)
        .map { case (n, b) => s""""stream:$n": $b""" }
        .mkString(",\n  \"streams\": {", ", ", "}")
    val json = s"""{\n  "version": $version,\n  "snapshot_id": "$sid"$parent$marker,\n  "files": $body\n}\n"""
    Files.createDirectories(metaDir(dir))
    writeAtomic(metaDir(dir).resolve(f"v$version%05d.json"), json)
    writeAtomic(metaDir(dir).resolve("_current"), version.toString)
    version
  }

  /** Read the table as of a version (default: current). Snapshot isolation:
    * the file list is resolved HERE, once — later appends don't change it.
    */
  def read(spark: SparkSession, dir: String, asOfVersion: Int = -1): DataFrame = {
    val v = if (asOfVersion > 0) asOfVersion else currentVersion(dir)
    require(v > 0, s"no snapshots in $dir")
    val files = snapshot(dir, v).files
    spark.read.parquet(files.map(_.path): _*).drop("_stats")
  }

  /** Read with manifest-stats pruning: keep only files whose [min,max]
    * intersects a query cell (the Iceberg partition/stats pruning the
    * flagship relies on for AOI scans at 100 TB).
    */
  def pruneRead(spark: SparkSession, dir: String, cells: Set[Long],
                asOfVersion: Int = -1): (DataFrame, Int, Int) = {
    val v = if (asOfVersion > 0) asOfVersion else currentVersion(dir)
    val all = snapshot(dir, v).files
    val sorted = cells.toArray.sorted
    val kept = all.filter { f =>
      val idx = java.util.Arrays.binarySearch(sorted, f.min)
      val ins = if (idx >= 0) idx else -idx - 1
      ins < sorted.length && sorted(ins) <= f.max
    }
    val df = if (kept.isEmpty)
      spark.read.parquet(all.head.path).drop("_stats").limit(0)
    else spark.read.parquet(kept.map(_.path): _*).drop("_stats")
    (df, kept.size, all.size)
  }

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
