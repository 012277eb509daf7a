package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Hand-built "Iceberg-shaped" table format (SURVEY.md A1): no Iceberg jar
  * ships in this sandbox, so the metadata layer an Iceberg table would
  * provide is implemented directly —
  *
  *   <table>/data/<uuid>/part-*.parquet      immutable data files
  *   <table>/metadata/v00001.json …          snapshot per version:
  *       {version, snapshot_id, parent, schema_ddl, files:[...], deletes:[...]}
  *   <table>/metadata/_current                pointer file (tmp→rename)
  *
  * giving the Iceberg properties the engine relies on:
  *   - snapshot isolation: readers resolve a version once and see an
  *     immutable file list (appends create a NEW version);
  *   - time travel: `read(dir, asOfVersion = n)`;
  *   - file-level stats pruning: each file carries min/max of a stats
  *     column (the zcell(12) clustering key for the images table), and
  *     `pruneRead` keeps only files whose range intersects the query cells;
  *   - merge-on-read row deletes (Iceberg v2 equality-delete shape): a
  *     delete commit writes only the matched KEYS as a delete file — no
  *     data-file rewrite — and readers anti-merge at scan time; `compact`
  *     folds applicable deletes into the files it rewrites. Sequence
  *     semantics follow Iceberg: a delete file applies to data files
  *     committed strictly BEFORE it (`file.seq < delete.seq`), so rows
  *     appended after the delete with a recycled key are not affected.
  *     POSITION deletes (`deleteWhereMoRPos`, Iceberg v2's second delete
  *     kind) record `(file, row-position)` pairs instead of keys — no key
  *     column needed — and anti-merge on the parquet scan's `_metadata`
  *     coordinates; compaction folds them the same way;
  *   - schema evolution: every snapshot records its own schema (DDL) in
  *     the manifest; `addColumn` commits a metadata-only snapshot and
  *     old data files read back with the new column null-backfilled,
  *     while time travel returns each snapshot under its own schema;
  *   - write-audit-publish: `stageAppend` commits a snapshot WITHOUT
  *     advancing the main pointer (audit it by version), then `publish`
  *     fast-forwards — or cherry-picks the appended files onto a main
  *     that moved during the audit (Iceberg's WAP / cherrypick_snapshot).
  *     Chain-dependent reads (CDC, timestamp travel, expiration) walk
  *     PARENT pointers, never version arithmetic, so staged snapshots
  *     are invisible to them until published;
  *   - named refs: immutable `tag`s (the reproducible-dataset pin —
  *     expiration never reclaims a tagged snapshot) and mutable
  *     `branch`es (multi-commit staged chains published as one
  *     fast-forward or one cherry-pick via `publishBranch`).
  *
  * Commits are atomic via tmp-write + rename of the pointer; concurrent
  * appends would need a CAS on `_current` (single-writer here, noted).
  */
object IcebergLite {
  /** `seq` = version at which the file was committed (0 on legacy
    * manifests) — the ordering key for merge-on-read delete applicability.
    */
  final case class FileEntry(path: String, rows: Long, min: Long, max: Long,
                             seq: Int = 0)
  /** Equality-delete file: parquet of deleted KEY values (single column
    * named `key`), applying to data files with `seq < this.seq`.
    */
  final case class DeleteEntry(path: String, rows: Long, key: String, seq: Int)
  /** `streams` carries the LATEST committed batchId per stream name, merged
    * forward at every commit — so exactly-once lookup is O(1) metadata reads
    * (one snapshot JSON), not a parent-chain walk that degrades to
    * O(versions) on tables mixing batch appends with streaming.
    */
  /** One schema-evolution event (Iceberg's field-id ledger re-expressed for
    * name-based parquet reads): `v` = version at which it committed, `op` ∈
    * {add, rename, drop}, `a`/`b` = column name(s). Carried forward in FULL
    * at every commit (like `streams`), so a reader resolves any file's
    * write-time column names from ONE snapshot JSON: a file with seq s was
    * written under the names in effect at version s — ops with `v > s`
    * are un-applied per file group at scan time (rename read-mapped,
    * re-added columns nulled so dropped data never resurrects).
    */
  final case class ColOp(v: Int, op: String, a: String, b: String = "")
  final case class Snapshot(version: Int, snapshotId: String, parent: Option[Int],
                            files: Seq[FileEntry],
                            deletes: Seq[DeleteEntry] = Seq.empty,
                            schemaDdl: Option[String] = None,
                            streams: Map[String, Long] = Map.empty,
                            ts: Long = 0L,
                            colOps: Seq[ColOp] = Seq.empty)

  private def metaDir(dir: String): Path = Paths.get(dir, "metadata")

  /** Normalize a data-file path for identity comparison: strip a
    * `file:`-scheme prefix if present. NOT java.net.URI — raw paths with
    * spaces or other URI-illegal characters are valid filesystem paths and
    * must not crash maintenance (round-4 advice).
    */
  private def norm(p: String): String = {
    val noScheme = if (p.startsWith("file:")) p.substring(5) else p
    // collapse any duplicated leading slashes a Hadoop file: URI carries
    var i = 0
    while (i + 1 < noScheme.length && noScheme.charAt(i) == '/' && noScheme.charAt(i + 1) == '/') i += 1
    noScheme.substring(i)
  }

  def currentVersion(dir: String): Int = {
    val p = metaDir(dir).resolve("_current")
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  private val VersionFile = """v(\d{5})\.json""".r

  /** Every snapshot version whose manifest still exists (ascending) —
    * includes STAGED (unpublished write-audit-publish) snapshots, which
    * occupy version numbers off the main chain.
    */
  private def listVersions(dir: String): Seq[Int] = {
    val md = metaDir(dir)
    if (!Files.exists(md)) return Seq.empty
    val s = Files.list(md)
    try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case VersionFile(v) => v.toInt }.toArray.sorted.toSeq
    finally s.close()
  }

  private def snapshotExists(dir: String, version: Int): Boolean =
    version >= 1 && Files.exists(metaDir(dir).resolve(f"v$version%05d.json"))

  /** Next version number to allocate: one past the highest EXISTING
    * manifest (not the main head — a staged snapshot holds its number even
    * though `_current` never pointed at it). Single-writer, like every
    * commit here.
    */
  private def nextVersion(dir: String): Int =
    math.max(listVersions(dir).lastOption.getOrElse(0), currentVersion(dir)) + 1

  /** The MAIN chain, newest first: walk parent pointers from `_current`
    * until the root or the expiration horizon (first missing manifest).
    * Staged snapshots are never on it. O(retained window) metadata reads.
    */
  private def mainChain(dir: String): Seq[Snapshot] = {
    var v = currentVersion(dir)
    val buf = scala.collection.mutable.ArrayBuffer[Snapshot]()
    while (v > 0 && snapshotExists(dir, v)) {
      val s = snapshot(dir, v)
      buf += s
      v = s.parent.getOrElse(0)
    }
    buf.toSeq
  }

  def snapshot(dir: String, version: Int): Snapshot = {
    val txt = new String(Files.readAllBytes(
      metaDir(dir).resolve(f"v$version%05d.json")), StandardCharsets.UTF_8)
    val entry = ("""\{"path": "([^"]+)", "rows": (\d+), "min": (-?\d+), """ +
      """"max": (-?\d+)(?:, "seq": (\d+))?\}""").r
    val files = entry.findAllMatchIn(txt).map(m =>
      FileEntry(m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4).toLong,
        Option(m.group(5)).map(_.toInt).getOrElse(0))).toSeq
    val delEntry = """\{"path": "([^"]+)", "rows": (\d+), "key": "([^"]+)", "seq": (\d+)\}""".r
    val deletes = delEntry.findAllMatchIn(txt).map(m =>
      DeleteEntry(m.group(1), m.group(2).toLong, m.group(3), m.group(4).toInt)).toSeq
    val sid = """"snapshot_id": "([^"]+)"""".r.findFirstMatchIn(txt).get.group(1)
    val parent = """"parent": (\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    val schemaDdl = """"schema_ddl": "((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(txt)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    val streams = """"stream:([^"]+)": (-?\d+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    val ts = """"ts": (\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    val colOp = """\{"cv": (\d+), "op": "(add|rename|drop)", "a": "([^"]+)"(?:, "b": "([^"]+)")?\}""".r
    val colOps = colOp.findAllMatchIn(txt).map(m =>
      ColOp(m.group(1).toInt, m.group(2), m.group(3),
        Option(m.group(4)).getOrElse(""))).toSeq
    Snapshot(version, sid, parent, files, deletes, schemaDdl, streams, ts, colOps)
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
  private def footerStats(spark: SparkSession, dataDir: String, seq: Int): Seq[FileEntry] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val footer = reader.getFooter
          var rows = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          footer.getBlocks.asScala.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala.find(_.getPath.toDotString == "_stats").foreach { c =>
              val st = c.getStatistics
              if (st != null && !st.isEmpty) {
                st.genericGetMin match {
                  case l: java.lang.Long =>
                    mn = math.min(mn, l); mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Long])
                  case _ => ()
                }
              }
            }
          }
          if (mn == Long.MaxValue) { mn = 0L; mx = 0L }
          FileEntry(f.getPath.toUri.getPath, rows, mn, mx, seq)
        } finally reader.close()
      }
      .sortBy(_.path)
  }

  def append(spark: SparkSession, dir: String, df: DataFrame, statsCol: Column,
             streamMarker: Option[(String, Long)] = None): Int =
    appendImpl(spark, dir, df, statsCol, streamMarker, advance = true)

  /** WRITE-AUDIT-PUBLISH stage (Iceberg's WAP / `stage-only` commit): write
    * the batch and its snapshot manifest, but do NOT advance the main
    * pointer — readers of the table see nothing. The staged snapshot is
    * readable by version (`read(dir, asOfVersion = staged)`) for the AUDIT
    * step (row counts, quality gates, dedup checks), then [[publish]] makes
    * it live — or it is simply abandoned, and [[expireSnapshots]] reclaims
    * its files once it ages past the retention window (Iceberg expires
    * unpublished WAP snapshots the same way).
    *
    * This is the 100 TB ingestion audit gate: the expensive write happens
    * once, audit queries run against real committed files, and the go/no-go
    * decision is a pure metadata operation either way.
    */
  def stageAppend(spark: SparkSession, dir: String, df: DataFrame,
                  statsCol: Column): Int =
    appendImpl(spark, dir, df, statsCol, None, advance = false)

  private def appendImpl(spark: SparkSession, dir: String, df: DataFrame,
                         statsCol: Column, streamMarker: Option[(String, Long)],
                         advance: Boolean, headVersion: Int = -1): Int = {
    // headVersion >= 0 chains the commit off an explicit parent (branch
    // appends) instead of the main head
    val cur = if (headVersion >= 0) headVersion else currentVersion(dir)
    val snapOpt = if (cur > 0) Some(snapshot(dir, cur)) else None
    val old = snapOpt.map(_.files).getOrElse(Seq.empty)
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    val withStats = df.withColumn("_stats", statsCol)
    // schema evolution: if the table already has a schema, write the batch
    // ALIGNED to it (missing columns null-backfilled, order normalized) so
    // every file of a snapshot is readable under the snapshot schema
    val tableSchema = snapOpt.flatMap(_.schemaDdl).map(StructType.fromDDL)
    val aligned = tableSchema match {
      case Some(ts) =>
        val have = withStats.columns.toSet
        val extra = have -- ts.fieldNames.toSet
        require(extra.isEmpty,
          s"append schema has unknown column(s) ${extra.mkString(",")} — addColumn first")
        withStats.select(ts.fields.map(f =>
          if (have.contains(f.name)) col(f.name).cast(f.dataType)
          else lit(null).cast(f.dataType).as(f.name)): _*)
      case None => withStats
    }
    aligned.write.mode("error").parquet(dataDir)
    // per-file stats from the parquet FOOTERS the write just produced
    // (row counts + `_stats` column min/max) — a metadata-only driver read,
    // exactly how an Iceberg commit collects manifests; the previous
    // implementation re-READ the whole batch per append (write-side read
    // amplification at scale)
    val next = nextVersion(dir)
    val stats = footerStats(spark, dataDir, next)
    val ddl = tableSchema.map(_.toDDL).orElse(Some(aligned.schema.toDDL))
    commitSnapshot(dir, cur, next, old ++ stats,
      deletes = snapOpt.map(_.deletes).getOrElse(Seq.empty),
      schemaDdl = ddl, streamMarker = streamMarker, advance = advance)
  }

  /** PUBLISH a staged snapshot (the WAP go decision). Two arms, both pure
    * metadata:
    *   - FAST-FORWARD: main has not moved since the stage (the staged
    *     snapshot's parent IS the current head) — swing `_current` to it;
    *     no new snapshot, O(1).
    *   - CHERRY-PICK (Iceberg's `cherrypick_snapshot`): main moved while
    *     the audit ran. Only APPEND stages re-apply safely (their added
    *     files carry no dependence on the base they were staged against):
    *     commit a NEW main snapshot = current state + the staged files,
    *     re-sequenced to the new version. Re-seq matters for merge-on-read
    *     deletes: a delete committed on main DURING the audit applies only
    *     to files with `seq < delete.seq`, and the cherry-picked files
    *     logically arrive AFTER it — they must not lose rows to it.
    *     Raises if the staged snapshot was not a pure append over its own
    *     parent, if its schema no longer matches main's, or if its parent
    *     manifest has been expired.
    *
    * Publishing a snapshot already on the main chain raises (double
    * publish would duplicate its rows through the cherry-pick arm).
    *
    * Generalizes to MULTI-COMMIT chains ([[publishBranch]]): the base is
    * the FORK POINT — the first ancestor of `head` that sits on the main
    * chain — found by the same parent walk every chain-dependent read
    * uses. For a single staged snapshot the fork point IS its parent, so
    * the single-stage semantics are unchanged.
    */
  def publish(dir: String, stagedVersion: Int): Int =
    publishChain(dir, stagedVersion)

  private def publishChain(dir: String, head: Int): Int = {
    require(snapshotExists(dir, head),
      s"no snapshot v$head in $dir (expired or never staged?)")
    val cur = currentVersion(dir)
    val mainVersions = mainChain(dir).map(_.version).toSet
    require(!mainVersions.contains(head),
      s"v$head is already on the main chain — double publish")
    // fork point: walk parent pointers from `head` until the main chain
    // (0 = the chains share no commit — `head` is a staged root)
    var v = head
    var fork = -1
    while (fork < 0) {
      val p = snapshot(dir, v).parent.getOrElse(0)
      if (p == 0) fork = 0
      else {
        require(snapshotExists(dir, p),
          s"staged base v$p has been expired — cannot verify the stage was append-only")
        if (mainVersions.contains(p)) fork = p else v = p
      }
    }
    if (fork == cur)
      { writeAtomic(metaDir(dir).resolve("_current"), head.toString); head }
    else {
      val headSnap = snapshot(dir, head)
      val baseFiles =
        if (fork == 0) Set.empty[String]
        else snapshot(dir, fork).files.map(f => norm(f.path)).toSet
      val baseDeletes =
        if (fork == 0) Set.empty[String]
        else snapshot(dir, fork).deletes.map(d => norm(d.path)).toSet
      val missing = baseFiles -- headSnap.files.map(f => norm(f.path)).toSet
      require(missing.isEmpty &&
        headSnap.deletes.map(d => norm(d.path)).toSet == baseDeletes,
        s"staged v$head is not a pure append over its base v$fork — " +
          "only append stages can be cherry-picked onto a moved main")
      val curSnap = snapshot(dir, cur)
      require(headSnap.schemaDdl == curSnap.schemaDdl,
        s"schema changed on main since v$head was staged — re-stage")
      val added = headSnap.files.filter(f => !baseFiles.contains(norm(f.path)))
      val next = nextVersion(dir)
      // the staged chain's stream markers ride into the published commit
      // (branch wins on conflict: the branch head has the stream's latest),
      // so exactly-once lookup survives a cherry-pick publish
      commitSnapshot(dir, cur, next, curSnap.files ++ added.map(_.copy(seq = next)),
        deletes = curSnap.deletes, schemaDdl = curSnap.schemaDdl,
        extraStreams = headSnap.streams)
    }
  }

  // ──────────────────── named refs: tags and branches ────────────────────
  // The Iceberg ref model [Iceberg spec §"Snapshot References"]: a TAG is
  // an immutable named pointer to one snapshot (the reproducible-dataset
  // verb — "train-v1 is exactly this corpus"), a BRANCH is a mutable named
  // pointer advanced by append commits off the main chain (a multi-commit
  // write-audit-publish: ingest several batches, audit the branch as a
  // whole, publish once). Refs are one metadata file each; every ref verb
  // is O(1) metadata, independent of table size. [[expireSnapshots]] never
  // expires a snapshot a ref points at, so a tagged training corpus stays
  // readable (and its files on disk) for as long as the tag exists.

  private val RefName = """[A-Za-z0-9][A-Za-z0-9._-]*""".r
  private def refPath(dir: String, kind: String, name: String): Path = {
    require(RefName.matches(name), s"invalid ref name '$name'")
    metaDir(dir).resolve(s"ref.$kind.$name")
  }
  private def refVersion(dir: String, kind: String, name: String): Int = {
    val p = refPath(dir, kind, name)
    require(Files.exists(p), s"no $kind '$name' in $dir")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
  }
  private def listRefs(dir: String, kind: String): Map[String, Int] = {
    val md = metaDir(dir)
    if (!Files.exists(md)) return Map.empty
    val s = Files.list(md)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith(s"ref.$kind.")).toSeq
      .map { f => val n = f.stripPrefix(s"ref.$kind."); n -> refVersion(dir, kind, n) }
      .toMap
    finally s.close()
  }

  /** Create an immutable tag at `version` (default: current main head).
    * Tags never move — re-tagging a name raises; drop it first. Tagging a
    * STAGED version is allowed (audit artifacts are pinnable too).
    */
  def tag(dir: String, name: String, version: Int = -1): Int = {
    val v = if (version > 0) version else currentVersion(dir)
    require(snapshotExists(dir, v), s"cannot tag v$v — no such snapshot in $dir")
    val p = refPath(dir, "tag", name)
    require(!Files.exists(p),
      s"tag '$name' already exists (tags are immutable — dropTag first)")
    writeAtomic(p, v.toString); v
  }
  def tagVersion(dir: String, name: String): Int = refVersion(dir, "tag", name)
  /** `VERSION AS OF <tag>` read: the exact snapshot the tag pins. */
  def readTag(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, asOfVersion = tagVersion(dir, name))
  def dropTag(dir: String, name: String): Unit = {
    Files.deleteIfExists(refPath(dir, "tag", name)); ()
  }
  def listTags(dir: String): Map[String, Int] = listRefs(dir, "tag")

  /** Create a branch at `from` (default: current main head). Branch
    * commits are STAGED snapshots chained off the branch head — invisible
    * to main-chain readers until [[publishBranch]].
    */
  def createBranch(dir: String, name: String, from: Int = -1): Int = {
    val v = if (from > 0) from else currentVersion(dir)
    require(snapshotExists(dir, v), s"cannot branch from v$v — no such snapshot in $dir")
    val p = refPath(dir, "branch", name)
    require(!Files.exists(p), s"branch '$name' already exists")
    writeAtomic(p, v.toString); v
  }
  def branchHead(dir: String, name: String): Int = refVersion(dir, "branch", name)
  def readBranch(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, asOfVersion = branchHead(dir, name))
  def dropBranch(dir: String, name: String): Unit = {
    Files.deleteIfExists(refPath(dir, "branch", name)); ()
  }
  def listBranches(dir: String): Map[String, Int] = listRefs(dir, "branch")

  /** Append a batch to a branch: a staged commit whose parent is the
    * branch head, then the branch ref swings to it. Append-only by
    * construction — which is exactly what keeps the whole branch
    * publishable by cherry-pick after main moves.
    */
  def appendToBranch(spark: SparkSession, dir: String, name: String,
                     df: DataFrame, statsCol: Column,
                     streamMarker: Option[(String, Long)] = None): Int = {
    val v = appendImpl(spark, dir, df, statsCol, streamMarker, advance = false,
      headVersion = branchHead(dir, name))
    writeAtomic(refPath(dir, "branch", name), v.toString)
    v
  }

  /** Highest streaming batchId committed ON A BRANCH for `name`, or -1 —
    * the exactly-once lookup for streams that quarantine into a branch
    * (write-audit-publish ingest). Same O(1) contract as
    * [[lastStreamBatch]]: the branch head's snapshot carries the full
    * per-stream map merged forward along the branch chain.
    *
    * Crash window note: a branch commit lands in two steps (snapshot
    * write, then ref swing). A crash between them leaves an orphaned
    * committed snapshot the ref never reached — the replayed batch then
    * re-commits off the OLD head and swings past it, so published output
    * stays exactly-once; the orphan is off every chain and is reclaimed
    * by [[expireSnapshots]] like any abandoned stage.
    */
  def lastBranchStreamBatch(dir: String, branch: String, name: String): Long =
    snapshot(dir, branchHead(dir, branch)).streams.getOrElse(name, -1L)

  /** Publish every commit of a branch onto main in one go: fast-forward
    * when main still sits at the fork point (Iceberg's
    * `fast_forward(main, branch)`), else one cherry-pick commit carrying
    * ALL files the branch added since the fork, re-sequenced after any
    * in-audit merge-on-read deletes. The branch ref stays (pointing into
    * the now-published history) until [[dropBranch]].
    */
  def publishBranch(dir: String, name: String): Int =
    publishChain(dir, branchHead(dir, name))

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
    if (snap.files.isEmpty) return cur
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
    // where the predicate is not TRUE. The rewrite reads MERGED (any
    // applicable MoR delete applied) so a CoW delete never resurrects rows.
    val next = nextVersion(dir)
    mergedRead(spark, snap, rewrite)
      .where(not(coalesce(predicate, lit(false))))
      .withColumn("_stats", statsCol)
      .write.mode("error").parquet(dataDir)
    val files = keep ++ footerStats(spark, dataDir, next)
    // deletes that applied only to rewritten files are folded; keep those
    // still applicable to a kept file
    val keptDeletes = snap.deletes.filter(d => keep.exists(_.seq < d.seq))
    commitSnapshot(dir, cur, next, files, deletes = keptDeletes, schemaDdl = snap.schemaDdl)
  }

  /** MERGE-ON-READ row-level DELETE (Iceberg v2 equality deletes): instead
    * of rewriting data files, commit a DELETE FILE holding only the `key`
    * values of matched rows; readers anti-merge it at scan time and
    * [[compact]] folds it into rewritten data files later.
    *
    * This is the 100 TB point-delete shape: a CoW delete of one row in a
    * 1 GB file rewrites 1 GB; the MoR delete writes a KB-sized key list
    * and defers the rewrite to compaction where it amortizes across the
    * whole maintenance pass. The cost moves to the read side — one
    * anti-join per delete generation — which is why compaction folds.
    *
    * Sequence semantics: the delete applies to data files with
    * `seq < deleteSeq` only, so a row appended LATER under the same key
    * is not deleted (Iceberg's sequence-number rule).
    *
    * `key` must be a column of the table; matched keys are deduplicated.
    * Returns the new version, or the current one when nothing matches.
    */
  def deleteWhereMoR(spark: SparkSession, dir: String, predicate: Column,
                     key: String): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val matched = readSnapshot(spark, snap)
      .where(coalesce(predicate, lit(false)))
      .select(col(key)).distinct()
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val delDir = s"$dir/deletes/$batch"
    matched.write.mode("error").parquet(delDir)
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(delDir)
    val fs = p.getFileSystem(conf)
    val delFiles = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val rowsByFile = spark.read.parquet(delDir)
      .groupBy(input_file_name().as("_f")).count()
      .collect().map(r => norm(r.getString(0)) -> r.getLong(1)).toMap
    val next = nextVersion(dir)
    val entries = delFiles.flatMap { f =>
      val path = f.getPath.toUri.getPath
      val n = rowsByFile.getOrElse(norm(path), 0L)
      if (n > 0) Some(DeleteEntry(path, n, key, next)) else None
    }
    if (entries.isEmpty) return cur // nothing matched — no empty commit
    commitSnapshot(dir, cur, next, snap.files,
      deletes = snap.deletes ++ entries, schemaDdl = snap.schemaDdl)
  }

  /** MERGE-ON-READ delete from an EXPLICIT key set — the apply-side verb
    * of CDC replication ([[syncCdcMirror]]) and of any upstream system
    * that already knows the keys to kill (a GDPR erasure feed, a spam-id
    * list): write the keys as a delete file and commit — O(|keys|), ZERO
    * scans of the table (deleteWhereMoR must scan to match a predicate;
    * here the caller IS the matcher). Keys absent from the table are
    * harmless (the anti-merge removes nothing). Sequence semantics as
    * always: only files with seq < this commit are affected, so rows
    * re-appended later survive. Returns the new version; empty key sets
    * commit nothing unless a stream marker must advance.
    */
  def deleteKeysMoR(spark: SparkSession, dir: String, keys: DataFrame,
                    key: String,
                    streamMarker: Option[(String, Long)] = None): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val delDir = s"$dir/deletes/$batch"
    keys.select(col(keys.columns.head).as(key)).distinct()
      .write.mode("error").parquet(delDir)
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(delDir)
    val fs = p.getFileSystem(conf)
    val delFiles = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val rowsByFile = spark.read.parquet(delDir)
      .groupBy(input_file_name().as("_f")).count()
      .collect().map(r => norm(r.getString(0)) -> r.getLong(1)).toMap
    val next = nextVersion(dir)
    val entries = delFiles.flatMap { f =>
      val path = f.getPath.toUri.getPath
      val n = rowsByFile.getOrElse(norm(path), 0L)
      if (n > 0) Some(DeleteEntry(path, n, key, next)) else None
    }
    if (entries.isEmpty && streamMarker.isEmpty) return cur
    commitSnapshot(dir, cur, next, snap.files,
      deletes = snap.deletes ++ entries, schemaDdl = snap.schemaDdl,
      streamMarker = streamMarker)
  }

  /** CDC MIRROR — full replication of a source table INCLUDING
    * merge-on-read deletes and add-column schema evolution (the
    * "downstream replica" composition [[syncIncremental]] can't cover:
    * that verb is append-only). Walks the source versions
    * (lastApplied, current] IN ORDER and applies each commit's effect:
    *   - appended files → [[append]] of exactly those rows;
    *   - equality-delete generations → [[deleteKeysMoR]] from the delete
    *     file's key set — O(|keys|), no mirror scan; the mirror's own
    *     sequence numbers reproduce the source semantics (a row deleted
    *     at v then re-appended at v' > v SURVIVES, because the mirror
    *     delete commits before the mirror append — the ordering a naive
    *     all-inserts-then-all-deletes replay gets wrong);
    *   - schema DDL changes → [[addColumn]] for each new field
    *     (idempotent: skipped if the mirror already has it).
    * Exactly-once: the applied source version is the stream marker INSIDE
    * each mirror commit; a crashed window resumes at the first unapplied
    * version, and replays no-op. First call bootstraps the full source
    * snapshot. RAISES on CoW rewrites (deleteWhere/merge/compact), on
    * position-delete generations (their (file, pos) coordinates name
    * SOURCE files — meaningless in the mirror; Iceberg CDC has the same
    * caveat), and on rollback windows — schedule mirror syncs before
    * maintenance, or re-bootstrap a fresh mirror.
    */
  def syncCdcMirror(spark: SparkSession, srcDir: String, dstDir: String,
                    statsCol: Column, name: String): (Int, Long) = {
    val from = if (currentVersion(dstDir) == 0) -1L else lastStreamBatch(dstDir, name)
    val to = currentVersion(srcDir)
    require(to > 0, s"source $srcDir has no snapshots")
    if (from >= to) return (currentVersion(dstDir), from)
    if (from < 1) {
      val v = append(spark, dstDir, read(spark, srcDir, asOfVersion = to),
        statsCol, streamMarker = Some((name, to.toLong)))
      return (v, to.toLong)
    }
    var dstV = currentVersion(dstDir)
    var v = from.toInt + 1
    while (v <= to) {
      val sv = snapshot(srcDir, v)
      val pv = snapshot(srcDir, v - 1)
      val prevPaths = pv.files.map(f => norm(f.path)).toSet
      val removed = prevPaths -- sv.files.map(f => norm(f.path)).toSet
      require(removed.isEmpty,
        s"source v$v rewrites/removes ${removed.size} file(s) — CDC mirror is " +
          "only defined over append/MoR-delete commits; re-bootstrap the mirror")
      // schema evolution first: files added at v may carry the new column
      if (sv.schemaDdl != pv.schemaDdl) {
        val dstSchema = StructType.fromDDL(snapshot(dstDir, currentVersion(dstDir))
          .schemaDdl.getOrElse(""))
        sv.schemaDdl.map(StructType.fromDDL).foreach { ns =>
          ns.fields.filter(f => f.name != "_stats" && !dstSchema.fieldNames.contains(f.name))
            .foreach(f => addColumn(spark, dstDir, f.name, f.dataType.sql))
        }
      }
      val newDeletes = sv.deletes.filter(_.seq == v)
      require(!newDeletes.exists(_.key == PosDeleteKey),
        s"source v$v commits a POSITION delete — (file, pos) pairs name source " +
          "files and cannot be mirrored; fold them (compact) and re-bootstrap")
      val added = sv.files.filter(f => !prevPaths.contains(norm(f.path)))
      require(added.isEmpty || newDeletes.isEmpty,
        s"source v$v both appends and deletes — no table verb produces this; " +
          "the mirror's per-version marker cannot split one source commit")
      if (newDeletes.nonEmpty) {
        newDeletes.foreach { d =>
          dstV = deleteKeysMoR(spark, dstDir,
            spark.read.parquet(d.path).toDF(d.key), d.key,
            streamMarker = Some((name, v.toLong)))
        }
      } else if (added.nonEmpty) {
        dstV = append(spark, dstDir, readChanges(spark, srcDir, v - 1, v),
          statsCol, streamMarker = Some((name, v.toLong)))
      }
      // metadata-only commits (pure schema change): nothing to apply; the
      // marker advances with the next data commit, and re-walking them on
      // resume is a deterministic no-op
      v += 1
    }
    (dstV, to.toLong)
  }

  /** Reserved `DeleteEntry.key` marker for POSITION delete files (the
    * second Iceberg v2 delete-file kind). Rows are `(file_path, pos)`
    * pairs naming deleted rows by physical location; `#` cannot appear in
    * a DDL column name, so the marker never collides with an equality key.
    */
  private val PosDeleteKey = "#pos"

  /** MERGE-ON-READ POSITION DELETE (Iceberg v2 position-delete files,
    * complementing [[deleteWhereMoR]]'s equality deletes): matched rows are
    * recorded as `(file_path, pos)` pairs — the parquet scan's
    * `_metadata.file_path`/`_metadata.row_index` — and readers anti-merge
    * on the pair. No key column is required, so this is the MoR delete
    * verb for tables WITHOUT a natural key and for predicates over non-key
    * columns (an equality delete on such a predicate would have to
    * materialize the matched KEYS anyway; a position delete skips the
    * detour). [[compact]] folds position debt exactly like equality debt.
    *
    * Sequence semantics come free: a pair can only name a row of a file
    * that existed when the delete committed, so rows appended later —
    * even byte-identical ones — are untouched (the Iceberg rule).
    *
    * Matching runs over the RAW data files (one pushdown-filtered scan);
    * rows already dead under earlier generations may re-match, which adds
    * redundant pairs the anti-merge makes a no-op. Returns the new
    * version, or the current one when nothing matches.
    */
  def deleteWhereMoRPos(spark: SparkSession, dir: String,
                        predicate: Column): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    if (snap.files.isEmpty) return cur
    val matched = readFiles(spark, snap, snap.files, withPos = true)
      .where(coalesce(predicate, lit(false)))
      .select(col("_file_path").as("file_path"), col("_pos").as("pos"))
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val delDir = s"$dir/deletes/$batch"
    matched.write.mode("error").parquet(delDir)
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(delDir)
    val fs = p.getFileSystem(conf)
    val delFiles = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val rowsByFile = spark.read.parquet(delDir)
      .groupBy(input_file_name().as("_f")).count()
      .collect().map(r => norm(r.getString(0)) -> r.getLong(1)).toMap
    val next = nextVersion(dir)
    val entries = delFiles.flatMap { f =>
      val path = f.getPath.toUri.getPath
      val n = rowsByFile.getOrElse(norm(path), 0L)
      if (n > 0) Some(DeleteEntry(path, n, PosDeleteKey, next)) else None
    }
    if (entries.isEmpty) return cur // nothing matched — no empty commit
    commitSnapshot(dir, cur, next, snap.files,
      deletes = snap.deletes ++ entries, schemaDdl = snap.schemaDdl)
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
    val updKeys = updates.select(col(key)).distinct()
    val touched =
      if (snap.files.isEmpty) Set.empty[String]
      else spark.read.parquet(snap.files.map(_.path): _*)
        .select(col(key), input_file_name().as("_f"))
        .join(broadcast(updKeys), key, "left_semi")
        .select("_f").distinct()
        .collect().map(r => norm(r.getString(0))).toSet
    val (rewrite, keep) = snap.files.partition(f => touched.contains(norm(f.path)))
    val survivors =
      if (rewrite.isEmpty) updates
      else mergedRead(spark, snap, rewrite).drop("_stats")
        .join(broadcast(updKeys), key, "left_anti")
        .unionByName(updates)
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    val next = nextVersion(dir)
    survivors.withColumn("_stats", statsCol)
      .write.mode("error").parquet(dataDir)
    val keptDeletes = snap.deletes.filter(d => keep.exists(_.seq < d.seq))
    commitSnapshot(dir, cur, next, keep ++ footerStats(spark, dataDir, next),
      deletes = keptDeletes, schemaDdl = snap.schemaDdl)
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
    * Merge-on-read deletes FOLD here: rewritten files are read with their
    * applicable delete files applied, and a delete entry survives the
    * compaction only while some kept-by-reference file still predates it
    * — the standard "compaction pays down the delete debt" maintenance
    * contract. A delete also FORCES the files it applies to into the
    * rewrite set (else the fold would silently drop the delete's effect
    * on kept files).
    *
    * At scale this is the standard small-file problem verb: many
    * micro-batch appends → one range-shuffle of only the small-file
    * subset (large files never rewritten ⇒ write amplification bounded
    * by the small fraction), metadata from footers only.
    *
    * Returns the new version, or the current one when <2 files qualify
    * and no delete needs folding.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileRows: Long = 1L << 20): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val (small, keep) = snap.files.partition(f =>
      f.rows < targetFileRows || snap.deletes.exists(_.seq > f.seq))
    if (small.size < 2 && snap.deletes.isEmpty) return cur
    if (small.isEmpty) return cur
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    val merged = mergedRead(spark, snap, small)
    val totalRows = small.map(_.rows).sum // pre-delete upper bound on size
    val outFiles = math.max(1L, (totalRows + targetFileRows - 1) / targetFileRows).toInt
    val next = nextVersion(dir)
    merged
      .repartitionByRange(outFiles, col("_stats"))
      .sortWithinPartitions(col("_stats"))
      .write.mode("error").parquet(dataDir)
    // kept files all have seq >= every delete's seq (deletes forced their
    // targets into the rewrite) — so no delete survives compaction
    commitSnapshot(dir, cur, next, keep ++ footerStats(spark, dataDir, next),
      deletes = Seq.empty, schemaDdl = snap.schemaDdl)
  }

  /** SORT-ORDER REWRITE (Iceberg's `rewrite_data_files` strategy=sort with
    * a z-order key: `ALTER TABLE … WRITE ORDERED BY` + rewrite): rewrite
    * ALL current data files clustered on a NEW `_stats` expression —
    * canonically the Morton z-interleave of (lon, lat), so spatially-near
    * rows land in the same files and per-file [min,max] z-ranges become
    * near-disjoint. After the rewrite, a bbox query's `pruneRead` keeps
    * only the files whose z-range intersects the query's cover cells —
    * the file-skipping story that makes a 100 TB geo table scannable: the
    * pruning ratio approaches (query area / table area) instead of 1.
    *
    * Differs from [[compact]] (which preserves the EXISTING clustering key
    * and rewrites only small files): this rewrites everything under a new
    * key, the one-off layout migration you run when the query pattern
    * changes. Merge-on-read deletes fold (files are read merged), so the
    * new snapshot carries zero delete debt. Snapshot isolation and time
    * travel hold as for every commit; the pre-rewrite layout remains
    * readable at its own versions until expired.
    *
    * One range shuffle of the full table — the unavoidable cost of
    * re-clustering; `repartitionByRange` samples the new key so output
    * files are equal-sized even under skew (a hot city doesn't produce
    * one giant file). Returns the new version.
    */
  def rewriteClustered(spark: SparkSession, dir: String, statsCol: Column,
                       targetFileRows: Long = 1L << 20): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    if (snap.files.isEmpty) return cur
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$dir/data/$batch"
    val reclustered = mergedRead(spark, snap, snap.files)
      .drop("_stats").withColumn("_stats", statsCol)
    val totalRows = snap.files.map(_.rows).sum // pre-delete upper bound
    val outFiles = math.max(1L, (totalRows + targetFileRows - 1) / targetFileRows).toInt
    val next = nextVersion(dir)
    reclustered
      .repartitionByRange(outFiles, col("_stats"))
      .sortWithinPartitions(col("_stats"))
      .write.mode("error").parquet(dataDir)
    commitSnapshot(dir, cur, next, footerStats(spark, dataDir, next),
      deletes = Seq.empty, schemaDdl = snap.schemaDdl)
  }

  /** SCHEMA EVOLUTION: add a nullable column — a METADATA-ONLY commit (no
    * data file touched, Iceberg's `ALTER TABLE … ADD COLUMN`). Existing
    * files read back with the column null-backfilled (the parquet reader
    * fills absent columns under an explicit schema); files written after
    * the evolution carry it physically. Time travel returns each snapshot
    * under its OWN schema — reading v(n-1) does not show the column.
    *
    * `dataType` is a DDL type string ("BIGINT", "STRING", "DOUBLE", …).
    * The column lands BEFORE the internal `_stats` column so user-visible
    * column order stays stable.
    */
  def addColumn(spark: SparkSession, dir: String, name: String,
                dataType: String): Int = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val ddl = snap.schemaDdl.getOrElse {
      require(snap.files.nonEmpty, "cannot infer schema of an empty legacy table")
      spark.read.parquet(snap.files.head.path).schema.toDDL
    }
    val cur0 = StructType.fromDDL(ddl)
    require(!cur0.fieldNames.contains(name), s"column $name already exists")
    val newField = StructType.fromDDL(s"`$name` $dataType").fields.head
    val (before, after) = cur0.fields.partition(_.name != "_stats")
    val evolved = StructType(before ++ Array(newField) ++ after)
    val next = nextVersion(dir)
    commitSnapshot(dir, cur, next, snap.files, deletes = snap.deletes,
      schemaDdl = Some(evolved.toDDL),
      // the add is ledgered so a DROP + later re-ADD of the same name never
      // resurrects the dropped data (files older than the add read null)
      addColOps = Seq(ColOp(next, "add", name)))
  }

  /** Metadata-only column RENAME (Iceberg `ALTER TABLE … RENAME COLUMN`):
    * zero data files touched; files written before the rename are read-
    * mapped at scan time via the col-op ledger, files after carry the new
    * name physically. Time travel to a pre-rename snapshot shows the old
    * name. MoR delete files keyed by the old name keep applying: their key
    * is resolved against each data file's WRITE-TIME names.
    */
  def renameColumn(spark: SparkSession, dir: String, from: String, to: String): Int = {
    require(from != "_stats" && to != "_stats", "_stats is engine-internal")
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val ddl = snap.schemaDdl.getOrElse {
      require(snap.files.nonEmpty, "cannot infer schema of an empty legacy table")
      spark.read.parquet(snap.files.head.path).schema.toDDL
    }
    val cur0 = StructType.fromDDL(ddl)
    require(cur0.fieldNames.contains(from), s"column $from does not exist")
    require(!cur0.fieldNames.contains(to), s"column $to already exists")
    require(!snap.deletes.exists(_.key == from),
      s"un-compacted merge-on-read deletes are keyed by $from — compact first")
    val evolved = StructType(cur0.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    val next = nextVersion(dir)
    commitSnapshot(dir, cur, next, snap.files, deletes = snap.deletes,
      schemaDdl = Some(evolved.toDDL), addColOps = Seq(ColOp(next, "rename", from, to)))
  }

  /** Metadata-only column DROP (Iceberg `ALTER TABLE … DROP COLUMN`): zero
    * data files touched — old files keep the bytes but name-based
    * projection never reads them, and a later re-`addColumn` of the same
    * name reads NULL from pre-re-add files (the ledgered add), never the
    * dropped data. Time travel to a pre-drop snapshot still shows the
    * column.
    */
  def dropColumn(spark: SparkSession, dir: String, name: String): Int = {
    require(name != "_stats", "_stats is engine-internal")
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    val snap = snapshot(dir, cur)
    val ddl = snap.schemaDdl.getOrElse {
      require(snap.files.nonEmpty, "cannot infer schema of an empty legacy table")
      spark.read.parquet(snap.files.head.path).schema.toDDL
    }
    val cur0 = StructType.fromDDL(ddl)
    require(cur0.fieldNames.contains(name), s"column $name does not exist")
    require(cur0.fields.count(_.name != "_stats") > 1,
      "cannot drop the last data column")
    require(!snap.deletes.exists(_.key == name),
      s"un-compacted merge-on-read deletes are keyed by $name — compact first")
    val evolved = StructType(cur0.fields.filter(_.name != name))
    val next = nextVersion(dir)
    commitSnapshot(dir, cur, next, snap.files, deletes = snap.deletes,
      schemaDdl = Some(evolved.toDDL), addColOps = Seq(ColOp(next, "drop", name)))
  }

  /** Snapshot expiration + orphan-file removal (Iceberg's
    * `expire_snapshots` / `remove_orphan_files` maintenance pair): retain
    * the last `retainLast` versions, drop every older snapshot JSON, and
    * physically delete data AND delete files referenced ONLY by expired
    * snapshots. Files a retained snapshot still references (kept-by-
    * reference across compact/delete/merge rewrites) are never touched, so
    * reads and time travel WITHIN the retained window are unaffected;
    * travel past it now fails — that is the verb's contract (history is
    * bounded so storage is: without it, every CoW rewrite strands its old
    * files forever).
    *
    * Returns (expired snapshot count, deleted file count). At scale
    * both walks are metadata-only (snapshot JSONs); deletes are per-file
    * driver calls exactly like Iceberg's maintenance action.
    */
  def expireSnapshots(dir: String, retainLast: Int = 2): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val cur = currentVersion(dir)
    require(cur > 0, s"no snapshots in $dir")
    // retention counts along the MAIN chain (parent walk) — staged
    // (unpublished write-audit-publish) snapshots don't consume retention
    // slots; everything older than the cutoff commit expires, INCLUDING
    // abandoned stages below it (how aborted WAP writes are reclaimed)
    val chain = mainChain(dir)
    val cutoff =
      if (chain.size <= retainLast) chain.last.version
      else chain(retainLast - 1).version
    // ref protection: a snapshot a tag or branch head points at NEVER
    // expires (its manifest and files stay), no matter how old — the
    // Iceberg ref-retention contract that makes a tagged training corpus
    // reproducible for the lifetime of the tag
    val refProtected = (listTags(dir).values ++ listBranches(dir).values).toSet
    val (doomed, kept) = listVersions(dir)
      .partition(v => v < cutoff && !refProtected.contains(v))
    if (doomed.isEmpty) return (0, 0)
    val retained = kept.flatMap { v =>
      val s = snapshot(dir, v)
      s.files.map(f => norm(f.path)) ++ s.deletes.map(d => norm(d.path))
    }.toSet
    var deletedFiles = 0
    var expired = 0
    doomed.foreach { v =>
      val s = snapshot(dir, v)
      (s.files.map(_.path) ++ s.deletes.map(_.path)).foreach { raw =>
        val p = Paths.get(norm(raw))
        if (!retained.contains(norm(raw)) && Files.deleteIfExists(p))
          deletedFiles += 1
      }
      Files.deleteIfExists(metaDir(dir).resolve(f"v$v%05d.json"))
      expired += 1
    }
    (expired, deletedFiles)
  }

  /** ROLLBACK (Iceberg's `rollback_to_snapshot`): make the table state of
    * `version` current again by committing a NEW snapshot that points at
    * the target's exact file/delete/schema state — history is preserved
    * (the bad snapshots stay readable for forensics until expireSnapshots
    * drops them), no data file is moved or rewritten, and the commit is
    * the same atomic metadata swap as every other verb. The undo verb for
    * a bad write: O(1) metadata, independent of table size.
    *
    * Stream markers are NOT rolled back: exactly-once ingest progress is
    * orthogonal to data state (re-ingesting an already-committed batch
    * after a rollback would double its rows — the marker forward-merge
    * prevents exactly that).
    *
    * Incremental readers note: a rollback window legitimately REMOVES
    * files relative to its parent, so readChanges/readChangesCdc across
    * one raises, same as any rewrite — poll before, or restart from the
    * rollback commit.
    */
  def rollbackTo(dir: String, version: Int): Int = {
    val cur = currentVersion(dir)
    require(snapshotExists(dir, version),
      s"rollback target must be an existing snapshot, got v$version (current $cur)")
    val target = snapshot(dir, version)
    // every commit records schema_ddl, so the restore pins the TARGET's
    // schema — rollback across an addColumn restores the pre-evolution one
    require(target.schemaDdl.nonEmpty || target.files.isEmpty,
      s"snapshot v$version predates schema recording — cannot restore its schema")
    // the restored line also pins the TARGET's col-op ledger: ops that
    // happened after the target are void on this line (a later re-add of a
    // column the target still has must not null the restored files)
    commitSnapshot(dir, cur, nextVersion(dir), target.files, deletes = target.deletes,
      schemaDdl = target.schemaDdl, colOpsOverride = Some(target.colOps))
  }

  /** Incremental append scan (Iceberg's incremental read contract): the
    * rows of data files ADDED between `fromVersion` (exclusive) and
    * `toVersion` (inclusive) — the "what arrived since I last looked"
    * verb a downstream batch consumer polls instead of re-scanning the
    * table. Mirrors Iceberg's restriction: if any `fromVersion` file is
    * GONE at `toVersion`, or a merge-on-read delete landed in the window,
    * a rewrite happened and added-files no longer mean appended-rows —
    * raise rather than return wrong increments.
    *
    * Metadata-only planning: two snapshot JSON reads, file-set difference.
    */
  def readChanges(spark: SparkSession, dir: String,
                  fromVersion: Int, toVersion: Int = -1): DataFrame = {
    val to = if (toVersion > 0) toVersion else currentVersion(dir)
    require(fromVersion >= 1 && to >= fromVersion,
      s"need 1 <= fromVersion <= toVersion, got $fromVersion..$to")
    val fromSnap = snapshot(dir, fromVersion)
    val fromFiles = fromSnap.files.map(f => norm(f.path)).toSet
    val toSnap = snapshot(dir, to)
    val toFiles = toSnap.files.map(f => norm(f.path)).toSet
    val removed = fromFiles -- toFiles
    require(removed.isEmpty,
      s"non-append change between v$fromVersion and v$to (${removed.size} file(s) " +
        "rewritten/removed) — incremental read is only defined over append snapshots")
    val newDeletes = toSnap.deletes.map(d => norm(d.path)).toSet --
      fromSnap.deletes.map(d => norm(d.path)).toSet
    require(newDeletes.isEmpty,
      s"merge-on-read delete committed between v$fromVersion and v$to — " +
        "incremental read is only defined over append snapshots")
    val added = toSnap.files.filter(f => !fromFiles.contains(norm(f.path)))
    if (added.isEmpty) emptyLike(spark, toSnap).drop("_stats")
    else readFiles(spark, toSnap, added).drop("_stats")
  }

  /** INCREMENTAL TABLE-TO-TABLE SYNC (Iceberg's streaming read —
    * `spark.readStream.format("iceberg")` — composed with the exactly-once
    * sink): consume the SOURCE table's append log into the DESTINATION
    * table, exactly once, with the destination's own stream-marker map as
    * the checkpoint — batchId = the source version this sync consumed,
    * committed INSIDE the destination snapshot, so there is no separate
    * checkpoint store and no crash window (the marker and the rows land in
    * one atomic commit; a replay reads the marker and no-ops).
    *
    * First call BOOTSTRAPS: the full source snapshot (merge-on-read
    * deletes applied) — Iceberg's initial-snapshot semantics. Later calls
    * ship only the files APPENDED since the last consumed version via
    * [[readChanges]], which RAISES if the window contains a rewrite or a
    * new MoR delete — the consumer must re-bootstrap or the producer must
    * schedule maintenance between sync windows (the Iceberg
    * streaming-read contract). Schema evolution on the source must be
    * applied to the destination first ([[addColumn]]); the append aligns
    * and null-backfills per the destination schema.
    *
    * At 100 TB this is the replication/downstream-materialization verb:
    * each sync moves only the new files' rows (one scan, one write, no
    * shuffle), and metadata-only source commits advance the checkpoint
    * with an empty append.
    *
    * Returns (destination version, source version consumed); no-op —
    * nothing new — returns the current pair unchanged.
    */
  def syncIncremental(spark: SparkSession, srcDir: String, dstDir: String,
                      statsCol: Column, name: String): (Int, Long) = {
    val from = if (currentVersion(dstDir) == 0) -1L else lastStreamBatch(dstDir, name)
    val to = currentVersion(srcDir)
    require(to > 0, s"source $srcDir has no snapshots")
    if (from >= to) return (currentVersion(dstDir), from)
    val rows =
      if (from < 1) read(spark, srcDir, asOfVersion = to)
      else readChanges(spark, srcDir, from.toInt, to)
    val v = append(spark, dstDir, rows, statsCol, streamMarker = Some((name, to.toLong)))
    (v, to.toLong)
  }

  /** CHANGELOG scan (Iceberg's `create_changelog_view` / CDC shape): every
    * row change between `fromVersion` (exclusive) and `toVersion`
    * (inclusive) with a `_change_type` column — `insert` for rows of files
    * appended in the window, `delete` for rows removed by merge-on-read
    * delete commits in the window (full row content restored by reading
    * the pre-delete snapshot — version `d.seq − 1` — filtered to the
    * delete's keys, which is exactly the row set that delete removed under
    * the sequence rule). A row appended AND deleted inside the window
    * emits both events, the standard changelog contract.
    *
    * CoW rewrites (deleteWhere/merge/compact) still RAISE: a rewrite
    * destroys file-level change attribution — run the changelog poll
    * BEFORE maintenance, or use MoR deletes (whose debt compaction folds
    * AFTER the consumer has seen the delete events).
    *
    * Needs the pre-delete snapshots still retained (expireSnapshots
    * bounds how far back a changelog can reach — same as Iceberg).
    */
  def readChangesCdc(spark: SparkSession, dir: String,
                     fromVersion: Int, toVersion: Int = -1): DataFrame = {
    val to = if (toVersion > 0) toVersion else currentVersion(dir)
    require(fromVersion >= 1 && to >= fromVersion,
      s"need 1 <= fromVersion <= toVersion, got $fromVersion..$to")
    // resolve the commit chain from `to` back to `fromVersion` via PARENT
    // pointers — not v−1 arithmetic: staged (write-audit-publish) snapshots
    // occupy version numbers OFF the chain, and their files must not
    // contribute events
    val chainBuf = scala.collection.mutable.ArrayBuffer[Snapshot]()
    var v = to
    var reached = false
    while (!reached) {
      require(snapshotExists(dir, v),
        s"snapshot v$v on the v$fromVersion..v$to chain has been expired — " +
          "changelog window exceeds the retention horizon")
      val s = snapshot(dir, v)
      chainBuf += s
      if (v == fromVersion) reached = true
      else v = s.parent.getOrElse(throw new IllegalArgumentException(
        s"v$fromVersion is not an ancestor of v$to (staged or divergent line)"))
    }
    val chain = chainBuf.reverse.toSeq // oldest (fromSnap) … newest (toSnap)
    val fromSnap = chain.head
    val toSnap = chain.last
    // walk the chain STEPWISE: a from↔to set-diff would miss a CoW rewrite
    // of a file that was itself appended inside the window (the rewritten
    // file never existed at either endpoint) and silently mis-attribute
    // its rows — any step that drops a file raises (spec-gated)
    chain.sliding(2).foreach {
      case Seq(a, b) =>
        val removed = a.files.map(f => norm(f.path)).toSet --
          b.files.map(f => norm(f.path)).toSet
        require(removed.isEmpty,
          s"copy-on-write rewrite at v${b.version} (${removed.size} file(s) rewritten/" +
            "removed) — changelog attribution is only defined over append + " +
            "merge-on-read-delete windows")
        // a step may only ADD delete generations: a rollback that drops one
        // silently re-inserts its rows — a consumer who saw the delete events
        // would never see the compensating inserts (spec-gated)
        val undone = a.deletes.map(d => norm(d.path)).toSet --
          b.deletes.map(d => norm(d.path)).toSet
        require(undone.isEmpty,
          s"rollback at v${b.version} undid ${undone.size} delete generation(s) — " +
            "changelog attribution is only defined over append + " +
            "merge-on-read-delete windows")
      case _ => ()
    }
    val fromFiles = fromSnap.files.map(f => norm(f.path)).toSet
    val added = toSnap.files.filter(f => !fromFiles.contains(norm(f.path)))
    val inserts =
      (if (added.isEmpty) emptyLike(spark, toSnap)
       else readFiles(spark, toSnap, added))
        .drop("_stats").withColumn("_change_type", lit("insert"))
    // pre-delete state of a delete committed at chain version v = v's
    // PARENT on the chain (not v−1: staged gaps)
    val preState = chain.sliding(2).collect { case Seq(a, b) => b.version -> a }.toMap
    val fromDeletes = fromSnap.deletes.map(d => norm(d.path)).toSet
    val newDeletes = toSnap.deletes.filter(d => !fromDeletes.contains(norm(d.path)))
    val deletes = newDeletes.map { d =>
      // a rollback can RE-APPLY a delete whose commit predates the window
      // (its seq is off the walked chain) — attribution is undefined there
      require(preState.contains(d.seq),
        s"delete generation seq=${d.seq} entered the window without its " +
          "commit (a rollback re-applied an old delete) — changelog " +
          "attribution is only defined over append + merge-on-read-delete windows")
      if (d.key == PosDeleteKey) {
        // position generation: restore full rows by (file, pos) semi-join
        // against the pre-delete state read WITH its physical coordinates
        val pre = mergedRead(spark, preState(d.seq), preState(d.seq).files,
          keepPos = true)
        val pos = spark.read.parquet(d.path).distinct()
        pre.join(broadcast(pos),
            pre("_file_path") === pos("file_path") && pre("_pos") === pos("pos"),
            "left_semi")
          .drop("_file_path", "_pos", "_stats")
          .withColumn("_change_type", lit("delete"))
      } else
        readSnapshot(spark, preState(d.seq))
          .join(broadcast(spark.read.parquet(d.path).toDF(d.key).distinct()),
            Seq(d.key), "left_semi")
          .drop("_stats").withColumn("_change_type", lit("delete"))
    }
    deletes.foldLeft(inserts)(_ unionByName _)
  }

  /** Write snapshot manifest `version` with explicit `parentVersion` (0 =
    * root) and, when `advance`, swing `_current` to it. `advance = false`
    * is the write-audit-publish STAGE: the snapshot exists and is readable
    * by version, but the main chain does not contain it until [[publish]].
    * Callers pre-allocate `version` via [[nextVersion]] so data-file `seq`
    * values match the manifest that commits them.
    */
  private def commitSnapshot(dir: String, parentVersion: Int, version: Int,
                             files: Seq[FileEntry],
                             deletes: Seq[DeleteEntry] = Seq.empty,
                             schemaDdl: Option[String] = None,
                             streamMarker: Option[(String, Long)] = None,
                             advance: Boolean = true,
                             extraStreams: Map[String, Long] = Map.empty,
                             addColOps: Seq[ColOp] = Seq.empty,
                             colOpsOverride: Option[Seq[ColOp]] = None): Int = {
    require(version > parentVersion,
      s"version $version must follow parent $parentVersion")
    val sid = java.util.UUID.randomUUID().toString
    val parentSnap = if (parentVersion > 0) Some(snapshot(dir, parentVersion)) else None
    // commit timestamp, STRICTLY monotonic along the parent chain (Iceberg's
    // timestamp-travel contract needs a total order even when two commits
    // land inside one clock tick)
    val ts = math.max(parentSnap.map(_.ts + 1).getOrElse(1L), System.currentTimeMillis())
    val body = files.map(f =>
      s"""    {"path": "${f.path}", "rows": ${f.rows}, "min": ${f.min}, "max": ${f.max}, "seq": ${f.seq}}""")
      .mkString("[\n", ",\n", "\n  ]")
    val delBody =
      if (deletes.isEmpty) ""
      else deletes.map(d =>
        s"""    {"path": "${d.path}", "rows": ${d.rows}, "key": "${d.key}", "seq": ${d.seq}}""")
        .mkString(",\n  \"deletes\": [\n", ",\n", "\n  ]")
    val parent = if (parentVersion > 0) s""",\n  "parent": $parentVersion""" else ""
    // schema carried forward from the parent unless the commit sets one
    val ddl = schemaDdl.orElse(parentSnap.flatMap(_.schemaDdl))
    val schemaLine = ddl.map(d =>
      s""",\n  "schema_ddl": "${d.replace("\\", "\\\\").replace("\"", "\\\"")}"""").getOrElse("")
    // merge the per-stream latest-batch map forward so EVERY snapshot carries
    // the full map and lastStreamBatch is O(1) metadata reads
    val streams = parentSnap.map(_.streams).getOrElse(Map.empty[String, Long]) ++
      extraStreams ++ streamMarker.toMap
    val marker =
      if (streams.isEmpty) ""
      else streams.toSeq.sortBy(_._1)
        .map { case (n, b) => s""""stream:$n": $b""" }
        .mkString(",\n  \"streams\": {", ", ", "}")
    // full col-op ledger carried forward at every commit (like streams):
    // any snapshot resolves any file's write-time names on its own
    val colOps =
      colOpsOverride.getOrElse(parentSnap.map(_.colOps).getOrElse(Seq.empty)) ++ addColOps
    val colBody =
      if (colOps.isEmpty) ""
      else colOps.map { o =>
        val b = if (o.b.nonEmpty) s""", "b": "${o.b}"""" else ""
        s"""    {"cv": ${o.v}, "op": "${o.op}", "a": "${o.a}"$b}"""
      }.mkString(",\n  \"col_ops\": [\n", ",\n", "\n  ]")
    val json = s"""{\n  "version": $version,\n  "snapshot_id": "$sid"$parent$schemaLine$marker,\n  "ts": $ts,\n  "files": $body$delBody$colBody\n}\n"""
    Files.createDirectories(metaDir(dir))
    writeAtomic(metaDir(dir).resolve(f"v$version%05d.json"), json)
    if (advance) writeAtomic(metaDir(dir).resolve("_current"), version.toString)
    version
  }

  /** Read a subset of a snapshot's data files UNDER THE SNAPSHOT SCHEMA
    * (absent columns null-backfilled — the add-column evolution contract);
    * no delete merge here.
    */
  private def readFiles(spark: SparkSession, snap: Snapshot,
                        files: Seq[FileEntry], withPos: Boolean = false): DataFrame = {
    require(files.nonEmpty, "readFiles needs at least one file")
    // `_metadata` is only addressable directly on a parquet relation, so
    // the position columns must be extracted BEFORE any evolution mapping
    def pos(df: DataFrame): DataFrame =
      if (!withPos) df
      else df.withColumn("_file_path", col("_metadata.file_path"))
             .withColumn("_pos", col("_metadata.row_index"))
    snap.schemaDdl match {
      case Some(ddl) =>
        val cur = StructType.fromDDL(ddl)
        // group files by the col ops that postdate them (epoch signature);
        // within a group every file was written under the SAME names
        files.groupBy(f => snap.colOps.filter(_.v > f.seq)).map {
          case (ops, fs) if ops.isEmpty =>
            pos(spark.read.schema(cur).parquet(fs.map(_.path): _*))
          case (ops, fs) =>
            // per current field: its name AT WRITE TIME, or None if the
            // field was (re-)added after these files were written — then it
            // must read as NULL even if a same-named pre-drop column is
            // physically present (Iceberg's field-id rule: dropped data
            // never resurrects)
            val atWrite: Array[Option[String]] = cur.fields.map { fld =>
              var name = fld.name
              var added = false
              ops.reverseIterator.foreach { op =>
                if (!added) op.op match {
                  case "rename" if op.b == name => name = op.a
                  case "add" if op.a == name    => added = true
                  case _                        => ()
                }
              }
              if (added) None else Some(name)
            }
            val readSchema = StructType(cur.fields.zip(atWrite).collect {
              case (fld, Some(phys)) => fld.copy(name = phys)
            })
            val raw = pos(spark.read.schema(readSchema).parquet(fs.map(_.path): _*))
            val mapped = cur.fields.zip(atWrite).map {
              case (fld, Some(phys)) => col(s"`$phys`").cast(fld.dataType).as(fld.name)
              case (fld, None)       => lit(null).cast(fld.dataType).as(fld.name)
            }.toIndexedSeq
            raw.select(mapped ++
              (if (withPos) Seq(col("_file_path"), col("_pos")) else Nil): _*)
        }.reduce(_ unionByName _)
      case None => pos(spark.read.parquet(files.map(_.path): _*))
    }
  }

  /** Empty DataFrame with the snapshot's schema — what reads return when a
    * snapshot has zero data files (e.g. deleteWhere removed every row);
    * never touches `files.head` (round-4 advice).
    */
  private def emptyLike(spark: SparkSession, snap: Snapshot): DataFrame = {
    val schema = snap.schemaDdl.map(StructType.fromDDL).getOrElse {
      require(snap.files.nonEmpty,
        s"snapshot v${snap.version} has no files and no recorded schema")
      spark.read.parquet(snap.files.head.path).schema
    }
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Merge-on-read scan of `files`: anti-join each delete generation's key
    * set against the data files it applies to (`file.seq < delete.seq`).
    * Data files are grouped by their applicable delete SET, so the plan has
    * one anti-join per delete generation per key column — bounded by the
    * (small) number of un-compacted delete commits, the same read
    * amplification Iceberg v2 carries until maintenance folds it. Delete
    * key sets are dim-sized (matched keys only) so Spark broadcasts them.
    *
    * POSITION deletes (key == [[PosDeleteKey]]) anti-merge on the pair
    * `(_metadata.file_path, _metadata.row_index)` — ONE broadcast anti-join
    * for all applicable position generations together, because a
    * (file, pos) pair names a physical row uniquely (no per-generation
    * sequencing needed: a pair can only reference a file that predates its
    * delete commit, so applicability is already encoded in the pair).
    *
    * `keepPos` keeps the `_file_path`/`_pos` columns on the result (the
    * CDC restore arm joins on them); otherwise they never appear or are
    * dropped before the union.
    */
  private def mergedRead(spark: SparkSession, snap: Snapshot,
                         files: Seq[FileEntry], keepPos: Boolean = false): DataFrame = {
    if (files.isEmpty) {
      val e = emptyLike(spark, snap)
      return if (!keepPos) e
      else e.withColumn("_file_path", lit(null).cast("string"))
            .withColumn("_pos", lit(null).cast("bigint"))
    }
    if (snap.deletes.isEmpty && !keepPos) return readFiles(spark, snap, files)
    val groups = files.groupBy(f => snap.deletes.filter(_.seq > f.seq).map(_.path).toSet)
    groups.map { case (delPaths, fs) =>
      val applicable = snap.deletes.filter(d => delPaths.contains(d.path))
      val (posDels, eqDels) = applicable.partition(_.key == PosDeleteKey)
      val needPos = keepPos || posDels.nonEmpty
      val base = readFiles(spark, snap, fs, withPos = needPos)
      val afterEq = eqDels.groupBy(_.key).foldLeft(base) { case (acc, (k, ds)) =>
        val keys = spark.read.parquet(ds.map(_.path): _*).toDF(k).distinct()
        acc.join(broadcast(keys), Seq(k), "left_anti")
      }
      val out =
        if (posDels.isEmpty) afterEq
        else {
          val pos = spark.read.parquet(posDels.map(_.path): _*).distinct()
          afterEq.join(broadcast(pos),
            afterEq("_file_path") === pos("file_path") && afterEq("_pos") === pos("pos"),
            "left_anti")
        }
      if (needPos && !keepPos) out.drop("_file_path", "_pos") else out
    }.reduce(_ unionByName _)
  }

  /** Full snapshot scan with delete merge + snapshot schema (internal). */
  private def readSnapshot(spark: SparkSession, snap: Snapshot): DataFrame =
    mergedRead(spark, snap, snap.files)

  /** Read the table as of a version (default: current). Snapshot isolation:
    * the file list is resolved HERE, once — later appends don't change it.
    * Merge-on-read deletes are applied; each snapshot reads under its own
    * schema (time travel across an addColumn shows/hides the column).
    */
  def read(spark: SparkSession, dir: String, asOfVersion: Int = -1): DataFrame = {
    val v = if (asOfVersion > 0) asOfVersion else currentVersion(dir)
    require(v > 0, s"no snapshots in $dir")
    readSnapshot(spark, snapshot(dir, v)).drop("_stats")
  }

  /** The MAIN-chain version current AT `tsMillis` (Iceberg's
    * `rollback_to_timestamp` / `TIMESTAMP AS OF` resolution): the latest
    * main snapshot whose commit ts is <= the given instant. Walks parent
    * pointers from the head — never version arithmetic, so staged
    * (unpublished) snapshots are invisible to timestamp travel, exactly as
    * in Iceberg. Commit ts is strictly monotonic along the chain, so the
    * first qualifying commit on the newest-first walk is exact. O(retained
    * window) metadata reads; raises if the instant predates the oldest
    * retained snapshot (same contract as travel past expireSnapshots).
    */
  def versionAt(dir: String, tsMillis: Long): Int = {
    val chain = mainChain(dir) // newest first
    require(chain.nonEmpty, s"no snapshots in $dir")
    chain.find(_.ts <= tsMillis).map(_.version).getOrElse {
      throw new IllegalArgumentException(
        s"no retained snapshot at or before ts=$tsMillis (oldest retained is " +
          s"v${chain.last.version} at ts=${chain.last.ts})")
    }
  }

  /** `TIMESTAMP AS OF` read: the table as it was at `tsMillis`. */
  def readAt(spark: SparkSession, dir: String, tsMillis: Long): DataFrame =
    read(spark, dir, asOfVersion = versionAt(dir, tsMillis))

  /** Read with manifest-stats pruning: keep only files whose [min,max]
    * intersects a query cell (the Iceberg partition/stats pruning the
    * flagship relies on for AOI scans at 100 TB).
    */
  def pruneRead(spark: SparkSession, dir: String, cells: Set[Long],
                asOfVersion: Int = -1): (DataFrame, Int, Int) = {
    val v = if (asOfVersion > 0) asOfVersion else currentVersion(dir)
    val snap = snapshot(dir, v)
    val all = snap.files
    val sorted = cells.toArray.sorted
    val kept = all.filter { f =>
      val idx = java.util.Arrays.binarySearch(sorted, f.min)
      val ins = if (idx >= 0) idx else -idx - 1
      ins < sorted.length && sorted(ins) <= f.max
    }
    val df = if (kept.isEmpty) emptyLike(spark, snap).drop("_stats")
    else mergedRead(spark, snap, kept).drop("_stats")
    (df, kept.size, all.size)
  }

  /** Region read — the user-facing "only this bbox" verb: manifest
    * pruning on the z-order stats key (cover cells at `level` must match
    * the level the table's `_stats` zcell was computed at), then the
    * exact bbox filter on the named micro-degree columns. After a
    * [[rewriteClustered]] on the same z-key this opens only the files
    * whose z-range meets the bbox — the Iceberg scan-filter push-down
    * shape. Returns (DataFrame, files kept, files total) so callers can
    * assert/monitor the skip ratio.
    */
  def readBbox(spark: SparkSession, dir: String, bbox: graft.core.BBoxM,
               level: Int, lonCol: String, latCol: String,
               asOfVersion: Int = -1): (DataFrame, Int, Int) = {
    val cells = graft.core.Seam.bboxCells(level, bbox)
      .map { case (x, y) => graft.core.Morton.encode(x, y) }.toSet
    val (df, kept, total) = pruneRead(spark, dir, cells, asOfVersion)
    // seam-crossing bbox (lonMin > lonMax): the in-world lon test is an OR
    val lonPred =
      if (graft.core.Seam.crosses(bbox))
        col(lonCol) >= bbox.lonMin || col(lonCol) <= bbox.lonMax
      else col(lonCol) >= bbox.lonMin && col(lonCol) <= bbox.lonMax
    val exact = df.where(lonPred &&
      col(latCol) >= bbox.latMin && col(latCol) <= bbox.latMax)
    (exact, kept, total)
  }

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ──────────────────── metadata tables (inspection surface) ───────────────
  // The Iceberg `table$history` / `$snapshots` / `$files` / `$refs` idea
  // [Iceberg docs: "Inspecting tables"]: the table's own metadata AS
  // DataFrames, so operational questions — outstanding delete debt, file
  // size histogram before compaction, which snapshot a tag pins — run
  // through the same engine as data queries and compose with it (join
  // `filesTable` against a scan, aggregate `historyTable` by day, …).
  // All are built from retained manifests: O(retained window) metadata
  // reads, ZERO data-file I/O, and driver-sized by construction — a
  // manifest carries one row per FILE, not per data row, so even a 100 TB
  // table's metadata frame is a few thousand rows.

  /** Main-chain commit history, newest first: one row per published
    * snapshot with its commit timestamp, lineage, and size counters.
    */
  def historyTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cur = currentVersion(dir)
    mainChain(dir).map { s =>
      (s.version, s.snapshotId, s.parent.getOrElse(0), s.ts,
        s.files.size, s.files.map(_.rows).sum,
        s.deletes.size, s.deletes.map(_.rows).sum,
        s.version == cur)
    }.toDF("version", "snapshot_id", "parent", "committed_at_ms",
      "data_files", "data_rows", "delete_files", "delete_rows", "is_current")
  }

  /** EVERY retained snapshot — main-chain AND staged/branch commits —
    * with an `on_main` flag (staged WAP/branch snapshots are the rows
    * where it is false).
    */
  def snapshotsTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val main = mainChain(dir).map(_.version).toSet
    listVersions(dir).sorted.map(v => snapshot(dir, v)).map { s =>
      (s.version, s.snapshotId, s.parent.getOrElse(0), s.ts,
        main.contains(s.version), s.files.size, s.files.map(_.rows).sum)
    }.toDF("version", "snapshot_id", "parent", "committed_at_ms",
      "on_main", "data_files", "data_rows")
  }

  /** Data-file manifest of a snapshot (default: current): path, row count,
    * stats range, and commit sequence — the frame compaction policy and
    * pruning diagnostics read.
    */
  def filesTable(spark: SparkSession, dir: String,
                 asOfVersion: Int = -1): DataFrame = {
    import spark.implicits._
    val v = if (asOfVersion > 0) asOfVersion else currentVersion(dir)
    snapshot(dir, v).files.map(f => (f.path, f.rows, f.min, f.max, f.seq))
      .toDF("path", "rows", "min", "max", "seq")
  }

  /** Outstanding merge-on-read delete files of a snapshot: `kind` is
    * "equality" or "position"; `key` is the equality column (null for
    * position files). Empty after a full compaction — `SUM(rows)` is the
    * table's current delete debt.
    */
  def deletesTable(spark: SparkSession, dir: String,
                   asOfVersion: Int = -1): DataFrame = {
    import spark.implicits._
    val v = if (asOfVersion > 0) asOfVersion else currentVersion(dir)
    snapshot(dir, v).deletes.map { d =>
      val pos = d.key == PosDeleteKey
      (d.path, d.rows, if (pos) "position" else "equality",
        if (pos) null else d.key, d.seq)
    }.toDF("path", "rows", "kind", "key", "seq")
  }

  /** Named refs: one row per tag and branch with the snapshot it points
    * at (Iceberg's `$refs`).
    */
  def refsTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    (listTags(dir).toSeq.map { case (n, v) => (n, "tag", v) } ++
      listBranches(dir).toSeq.map { case (n, v) => (n, "branch", v) })
      .sortBy(r => (r._2, r._1))
      .toDF("name", "kind", "version")
  }
}
