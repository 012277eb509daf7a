package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's contribution view
  * (SURVEY.md §J; [ref: oshdb-api/…/OSMContribution + celliterator
  * ContributionType]): the batch engine treats "time" as a data dimension;
  * here the same semantics run incrementally — tumbling event-time windows
  * with watermarks stand in for `aggregateByTimestamp` (D10), and
  * `flatMapGroupsWithState` reproduces the per-entity version-diff
  * classification (H8: CREATION / VALUE_CHANGE) as managed state.
  *
  * Scale: state is keyed by entity id — partitioned by the shuffle on the
  * grouping key, one small record per live entity; watermark bounds state
  * for the windowed aggregation. Both patterns run unchanged on a real
  * cluster against a file/Kafka source.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Contribution(user_id: Long, event_id: Long, ts: Timestamp,
                                kind: String, value: Double, prev_value: Double)
  final case class UserState(lastValue: Double, seen: Boolean)

  /** D10 under streaming: tumbling event-time counts with a watermark. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** H8 under streaming: per-user contribution classification via managed
    * state — first event ⇒ CREATION, changed value ⇒ VALUE_CHANGE, same
    * value ⇒ NO_CHANGE (mirrors the batch q19 contract).
    */
  def contributions(events: Dataset[Event]): Dataset[Contribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Contribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[UserState]) =>
          // within a micro-batch, order by event time then id (the batch
          // path's window ordering)
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(UserState(0.0, seen = false))
          val out = sorted.map { e =>
            val kind =
              if (!st.seen) "CREATION"
              else if (e.value != st.lastValue) "VALUE_CHANGE"
              else "NO_CHANGE"
            val prev = if (st.seen) st.lastValue else Double.NaN
            st = UserState(e.value, seen = true)
            Contribution(userId, e.event_id, e.ts, kind, e.value, prev)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class TaggedEvent(event_id: Long, ts: Timestamp, user_id: Long,
                               event_type: String, value: Double, props: String)
  final case class TypedContribution(user_id: Long, event_id: Long, ts: Timestamp,
                                     kinds: String, value: Double)
  final case class TypedState(lastValue: Double, lastProps: String,
                              visible: Boolean, seen: Boolean)

  /** FULL ContributionType classification under streaming — the upstream
    * enum is {CREATION, DELETION, TAG_CHANGE, GEOMETRY_CHANGE} as an
    * EnumSet [ref: oshdb-util/…/celliterator/ContributionType]; the graft's
    * events table has no OSM visible-flag, so the DELETION convention is:
    * `event_type == tombstoneType` marks the entity deleted (visible=false).
    * Rules, per entity (user_id), versions in (ts, event_id) order:
    *   - first visible version, or first after a tombstone ⇒ CREATION
    *     (re-creation after deletion is CREATION, as upstream);
    *   - tombstone while visible ⇒ DELETION; tombstone of nothing ⇒
    *     NO_CHANGE (upstream emits no contribution; a row keeps parity
    *     with the batch twin auditable);
    *   - visible→visible: TAG_CHANGE if props changed, VALUE_CHANGE if
    *     value changed — BOTH when both (the EnumSet); neither ⇒ NO_CHANGE.
    * `kinds` is the canonical '+'-joined sorted set, e.g.
    * "TAG_CHANGE+VALUE_CHANGE".
    */
  def typedContributions(events: Dataset[TaggedEvent],
                         tombstoneType: String = "error"): Dataset[TypedContribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TypedState, TypedContribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[TaggedEvent], state: GroupState[TypedState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(TypedState(0.0, "", visible = false, seen = false))
          val out = sorted.map { e =>
            val tomb = e.event_type == tombstoneType
            val kinds =
              if (tomb) { if (st.seen && st.visible) Seq("DELETION") else Seq("NO_CHANGE") }
              else if (!st.seen || !st.visible) Seq("CREATION")
              else {
                val k = (if (e.props != st.lastProps) Seq("TAG_CHANGE") else Nil) ++
                  (if (e.value != st.lastValue) Seq("VALUE_CHANGE") else Nil)
                if (k.isEmpty) Seq("NO_CHANGE") else k
              }
            // a tombstone keeps the last visible tags/value irrelevant: the
            // next visible version is a CREATION and compares against nothing
            st =
              if (tomb) st.copy(visible = false, seen = true)
              else TypedState(e.value, e.props, visible = true, seen = true)
            TypedContribution(userId, e.event_id, e.ts, kinds.sorted.mkString("+"), e.value)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class Fix(entity: Long, tus: Long, oid: Long, lon: Long, lat: Long)
  final case class TripState(tripNo: Long, nPts: Long, startUs: Long,
                             lastUs: Long, lastLon: Long, lastLat: Long,
                             lenQ: Long)
  final case class Trip(entity: Long, trip_no: Long, n_pts: Long,
                        start_us: Long, dur_us: Long, len_q: Long)

  /** Streaming twin of [[graft.operators.Trajectory.trips]] — session
    * windows with a data-defined gap as MANAGED STATE rather than a batch
    * window function: one `TripState` record per live entity carries the
    * open trip (number, fix count, start, last fix, running Σ⌊hop⌋) across
    * micro-batches; a fix whose gap to the carried last fix exceeds `gapUs`
    * EMITS the completed trip and opens the next one. A trip is emitted
    * exactly once, on the batch where its closing gap arrives — so a trip
    * spanning micro-batches accumulates silently until its dwell gap shows
    * up, exactly reproducing the batch operator's (tus, oid)-ordered
    * semantics as long as each entity's fixes arrive in (tus, oid) order
    * across batches (within a batch, order is free — the state function
    * sorts). The final open trip per entity flushes when the caller sends a
    * past-horizon fix (tus > everything + gapUs): the flush fix closes the
    * last real trip and parks an unemitted 1-fix trip in state, so the
    * emitted set equals the batch operator over the real fixes.
    *
    * The hop kernel is the identical fixed IEEE chain (exact int64 deltas →
    * double mul/add in fixed order → correctly-rounded sqrt → ⌊·⌋), so
    * streamed trip lengths are bit-equal to the batch/DuckDB twins.
    *
    * Scale: state is ONE fixed-width record per live entity (not per fix),
    * partitioned by the entity-key shuffle; the per-batch per-group sort is
    * task-local over that batch's fixes only. Nothing driver-sized.
    */
  def streamingTrips(fixes: Dataset[Fix], gapUs: Long): Dataset[Trip] = {
    require(gapUs > 0, "gapUs must be positive")
    import fixes.sparkSession.implicits._
    fixes.groupByKey(_.entity)
      .flatMapGroupsWithState[TripState, Trip](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, it: Iterator[Fix], state: GroupState[TripState]) =>
          val sorted = it.toArray.sortBy(f => (f.tus, f.oid))
          var st: TripState = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Trip]
          sorted.foreach { f =>
            if (st == null) {
              st = TripState(0L, 1L, f.tus, f.tus, f.lon, f.lat, 0L)
            } else if (f.tus - st.lastUs > gapUs) {
              out += Trip(entity, st.tripNo, st.nPts, st.startUs,
                st.lastUs - st.startUs, st.lenQ)
              st = TripState(st.tripNo + 1, 1L, f.tus, f.tus, f.lon, f.lat, 0L)
            } else {
              val dx = (f.lon - st.lastLon).toDouble
              val dy = (f.lat - st.lastLat).toDouble
              val hop = math.floor(math.sqrt(dx * dx + dy * dy)).toLong
              st = TripState(st.tripNo, st.nPts + 1, st.startUs, f.tus,
                f.lon, f.lat, st.lenQ + hop)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class StayState(cx: Long, cy: Long, enterUs: Long, lastUs: Long,
                             nFixes: Long)
  final case class Stay(entity: Long, cx: Long, cy: Long, enter_us: Long,
                        exit_us: Long, n_fixes: Long)

  /** Streaming twin of [[graft.operators.Trajectory.stayPoints]] — the
    * place-based dwell detector as MANAGED STATE: one `StayState` per live
    * entity carries the open same-cell run (cell, enter, last, fix count)
    * across micro-batches; a fix in a DIFFERENT cell emits the closed run
    * iff it passes the `minStayUs`/`minFixes` gates and opens the next run.
    * A stay is emitted exactly once, on the batch where the breaking fix
    * arrives, reproducing the batch operator's (tus, oid)-ordered runs as
    * long as each entity's fixes arrive in (tus, oid) order across batches
    * (within a batch the state function sorts). The final open run flushes
    * when the caller sends a past-horizon fix in an out-of-world-traffic
    * cell; the flush fix parks as an unemitted 1-fix run, so the emitted
    * set equals the batch operator over the real fixes. Cell assignment is
    * the same shift-before-div integer rule — every emitted number is
    * bit-equal to the batch/DuckDB twins.
    *
    * Scale: ONE fixed-width record per live entity, entity-key
    * partitioned; per-batch per-group sort is task-local. Nothing
    * driver-sized.
    */
  def streamingStayPoints(fixes: Dataset[Fix], cellMicro: Long,
                          minStayUs: Long, minFixes: Long,
                          lonShift: Long = 180000000L,
                          latShift: Long = 90000000L): Dataset[Stay] = {
    require(cellMicro > 0 && minStayUs >= 0 && minFixes >= 1,
      "need cellMicro > 0, minStayUs >= 0, minFixes >= 1")
    import fixes.sparkSession.implicits._
    fixes.groupByKey(_.entity)
      .flatMapGroupsWithState[StayState, Stay](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, it: Iterator[Fix], state: GroupState[StayState]) =>
          val sorted = it.toArray.sortBy(f => (f.tus, f.oid))
          var st: StayState = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Stay]
          sorted.foreach { f =>
            val cx = (f.lon + lonShift) / cellMicro
            val cy = (f.lat + latShift) / cellMicro
            if (st == null) {
              st = StayState(cx, cy, f.tus, f.tus, 1L)
            } else if (cx == st.cx && cy == st.cy) {
              st = st.copy(lastUs = f.tus, nFixes = st.nFixes + 1)
            } else {
              if (st.lastUs - st.enterUs >= minStayUs && st.nFixes >= minFixes)
                out += Stay(entity, st.cx, st.cy, st.enterUs, st.lastUs,
                  st.nFixes)
              st = StayState(cx, cy, f.tus, f.tus, 1L)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class HotState(count: Long, fired: Boolean)
  final case class HotEvent(cx: Long, cy: Long, t_cross: Long,
                            oid_cross: Long, n_at_cross: Long)

  /** Streaming HOTSPOT IGNITION — the first streaming RASTER operator:
    * cells accumulate fix counts across micro-batches and emit ONE event
    * when the cumulative count first reaches `threshold`, on the exact
    * fix that crosses it (t_cross/oid_cross = that fix) — the alerting
    * deployment shape of the density raster: "tell me the moment a cell
    * ignites", where the batch raster only says which cells are hot
    * after the fact. Exactly-once by construction: the `fired` flag in
    * the per-cell state suppresses re-emission forever; no flush file is
    * needed (a crossing is emitted by the crossing fix itself, the
    * [[streamingGeofence]] discipline, not the run-closing
    * trips/stays one).
    *
    * Determinism contract: per-cell (tus, oid) arrival order across
    * batches (the same staging contract as trips/stays); within a batch
    * the group sorts task-locally. The event set then equals the batch
    * twin "the threshold-th fix per cell in (tus, oid) order" —
    * a plain window row_number in SQL — bit for bit.
    *
    * Scale: state is ONE fixed-width record per OCCUPIED CELL (bounded
    * by the raster, not the stream), cell-key partitioned; `n_at_cross`
    * is always `threshold`, kept in the event as the state-count
    * certificate.
    */
  def streamingHotspots(fixes: Dataset[Fix], cellMicro: Long,
                        threshold: Long,
                        lonShift: Long = 180000000L,
                        latShift: Long = 90000000L): Dataset[HotEvent] = {
    require(cellMicro > 0 && threshold >= 1,
      "need cellMicro > 0 and threshold >= 1")
    import fixes.sparkSession.implicits._
    val K = 1073741824L
    fixes.groupByKey(f =>
        ((f.lon + lonShift) / cellMicro) * K + (f.lat + latShift) / cellMicro)
      .flatMapGroupsWithState[HotState, HotEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cell: Long, it: Iterator[Fix], state: GroupState[HotState]) =>
          val sorted = it.toArray.sortBy(f => (f.tus, f.oid))
          var st = state.getOption.getOrElse(HotState(0L, fired = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[HotEvent]
          sorted.foreach { f =>
            val c = st.count + 1
            if (!st.fired && c >= threshold) {
              out += HotEvent(cell / K, cell % K, f.tus, f.oid, c)
              st = HotState(c, fired = true)
            } else st = st.copy(count = c)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class FenceState(inside: Seq[Long])
  final case class FenceEvent(entity: Long, fence_id: Long, tus: Long,
                              enter: Long)

  /** Streaming twin of [[graft.operators.Trajectory.geofenceEvents]] — the
    * alerting deployment shape of geofencing: one `FenceState` per live
    * entity carries the set of fences it is currently inside across
    * micro-batches; each fix emits enter/exit events for exactly the
    * fences whose containment flag flips, ON the batch where the crossing
    * fix arrives (no flush needed — a crossing is emitted by the crossing
    * fix itself, unlike the run-closing semantics of trips/stays). The
    * before-first-observation state is "outside everything", matching the
    * batch operator's lag default. Same inclusive integer bbox containment
    * — the event stream is bit-equal to the batch/DuckDB twins given
    * per-entity (tus, oid) arrival order across batches.
    *
    * `fences` is a driver-side array (fence_id, lonMin, latMin, lonMax,
    * latMax) serialized into the state closure — the broadcast-sized
    * cardinality the batch operator specifies. State is O(#fences inside)
    * per entity, not per fix.
    */
  def streamingGeofence(fixes: Dataset[Fix],
                        fences: Array[(Long, Long, Long, Long, Long)])
      : Dataset[FenceEvent] = {
    require(fences.nonEmpty, "need at least one fence")
    import fixes.sparkSession.implicits._
    fixes.groupByKey(_.entity)
      .flatMapGroupsWithState[FenceState, FenceEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, it: Iterator[Fix], state: GroupState[FenceState]) =>
          val sorted = it.toArray.sortBy(f => (f.tus, f.oid))
          var inside = state.getOption
            .map(_.inside.toSet).getOrElse(Set.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer.empty[FenceEvent]
          sorted.foreach { f =>
            fences.foreach { case (fid, lo, la, hi, ha) =>
              val in = f.lon >= lo && f.lon <= hi && f.lat >= la && f.lat <= ha
              if (in && !inside(fid)) {
                out += FenceEvent(entity, fid, f.tus, 1L); inside += fid
              } else if (!in && inside(fid)) {
                out += FenceEvent(entity, fid, f.tus, 0L); inside -= fid
              }
            }
          }
          state.update(FenceState(inside.toSeq.sorted))
          out.iterator
      }
  }

  /** Streaming ingest dedup: drop re-deliveries of the same key within the
    * watermark horizon — the standard exactly-once-ish ingestion guard in
    * front of a training-data pipeline. State = one entry per key within
    * the watermark, evicted automatically.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Per-micro-batch writer for an IcebergLite table, EXACTLY-ONCE under
    * foreachBatch's at-least-once replay contract: the streaming batchId is
    * committed INSIDE the snapshot (atomic with the pointer rename), so a
    * batch replayed after a crash — or a duplicate delivery — is detected
    * via `lastStreamBatch` and skipped; there is no window where the data
    * landed but the marker didn't. Exposed separately from `icebergSink` so
    * replay behavior is directly testable.
    */
  def icebergBatchWriter(dir: String, statsCol: org.apache.spark.sql.Column,
                         queryName: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      if (batchId > graft.sources.IcebergLite.lastStreamBatch(dir, queryName) &&
          !batch.isEmpty) {
        graft.sources.IcebergLite.append(batch.sparkSession, dir, batch, statsCol,
          streamMarker = Some((queryName, batchId)))
      }

  /** Streaming ingest INTO the table layer: readStream → foreachBatch →
    * IcebergLite snapshots. Every micro-batch becomes one table version
    * (time-travelable, stats-pruned like any batch append); downstream batch
    * jobs see consistent snapshot-isolated reads while ingestion runs.
    */
  def icebergSink(stream: DataFrame, dir: String,
                  statsCol: org.apache.spark.sql.Column, queryName: String,
                  checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(icebergBatchWriter(dir, statsCol, queryName))
      .start()

  /** Per-micro-batch writer for streaming WRITE-AUDIT-PUBLISH: each batch
    * commits to a BRANCH of the IcebergLite table — quarantined from every
    * main-chain reader — with the same exactly-once batchId-inside-the-
    * snapshot contract as [[icebergBatchWriter]] (the marker lookup walks
    * the branch head, so replays after crash or duplicate delivery are
    * skipped). When the window closes, audit the branch
    * (`IcebergLite.readBranch`) and release it with ONE
    * `IcebergLite.publishBranch` — fast-forward if main never moved,
    * cherry-pick (markers carried) if it did. Bad windows are simply
    * `dropBranch`ed; nothing ever reached a consumer.
    */
  def icebergBranchBatchWriter(dir: String, branch: String,
                               statsCol: org.apache.spark.sql.Column,
                               queryName: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      if (batchId > graft.sources.IcebergLite.lastBranchStreamBatch(dir, branch, queryName) &&
          !batch.isEmpty) {
        graft.sources.IcebergLite.appendToBranch(batch.sparkSession, dir, branch,
          batch, statsCol, streamMarker = Some((queryName, batchId)))
      }

  /** Streaming WAP ingest: readStream → foreachBatch → branch commits.
    * The branch must exist (`IcebergLite.createBranch`) before the query
    * starts.
    */
  def icebergBranchSink(stream: DataFrame, dir: String, branch: String,
                        statsCol: org.apache.spark.sql.Column, queryName: String,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(icebergBranchBatchWriter(dir, branch, statsCol, queryName))
      .start()

  /** File-source wrapper: stream the driver `events` parquet dir. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)
      // driver parquet carries TIMESTAMP_NTZ; watermarks need TIMESTAMP
      .withColumn("ts", col("ts").cast("timestamp"))
  }
}
