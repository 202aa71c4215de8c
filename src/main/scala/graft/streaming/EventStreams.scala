package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Num

/** Structured Streaming surface over the `events` table shape
  * (TESTDATA.md; SURVEY §2.8's extension point). The reference has no
  * stream processing — these are the training-pipeline streaming
  * operators a 100 TB ingest needs: tumbling/sliding windowed
  * aggregation with watermarked late-data handling, and stateful
  * per-user sessionization.
  *
  * Every transform takes/returns DataFrames so the SAME code runs in
  * batch (tests, backfill) and streaming (readStream) — the Structured
  * Streaming unification.
  */
object EventStreams {

  val EventSchema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
    "event_type STRING, value DOUBLE, props STRING"

  /** File-source stream with the events schema. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).parquet(dir)

  /** Tumbling-window count+sum per event type, 10-minute watermark —
    * append-safe (late rows beyond the watermark are dropped). */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.sumExact(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding windows (overlapping) — e.g. 1h window every 15 min. */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  // ------------------------------------------------- sessionization

  /** Built-in session_window aggregation — the native-state sibling of
    * [[sessionize]]: Spark's session operator keeps the merge state,
    * the watermark closes sessions. Emits one row per CLOSED session in
    * append mode. Same inclusive gap boundary as the custom-state
    * variant and the batch twins (pinned in CohortsSpec). */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = 30,
                          watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Int, totalValue: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Int,
                         total_value: Double)

  case class SessionFragments(frags: List[SessionState])

  /** Gap-based sessionization: a session closes after `gapMinutes` of
    * inactivity. Custom state via flatMapGroupsWithState.
    *
    * Exactness under out-of-order arrival (the [[funnelStream]] rule):
    * a session is emitted only once NO admissible event can still
    * extend or bridge it — `end + gap < watermark` (every future
    * arrival has `t >= watermark`, and bridging needs
    * `t <= end + gap`). Until then the user's activity is held as
    * SORTED DISJOINT session fragments; each arrival merges into (and
    * can JOIN two of) them by standard interval merging, so a late
    * event within the watermark delay lands exactly where the batch
    * oracle would put it — including the bridge case, where two
    * fragments an eager emitter would have closed separately collapse
    * into the one session [[sessionizeBatch]] reports. An earlier
    * formulation emitted on the first in-trigger gap and moved a
    * session's `end` BACKWARD on a late arrival (end < start was
    * reachable within the operator's own 10-minute tolerance); the
    * fragment fold makes both shapes structurally impossible. State is
    * O(fragments), never O(events) — consecutive in-gap events
    * collapse into one fragment on arrival.
    *
    * Batch execution (tests, backfill) has no watermark, so everything
    * is final (`horizon = MaxValue`): the SAME code emits every
    * session and equals [[sessionizeBatch]] exactly — open sessions
    * are no longer silently parked in never-fired timeout state.
    *
    * CHECKPOINT COMPATIBILITY: the fragment fold changed the GroupState
    * encoding from one `SessionState` to `SessionFragments(List[...])`.
    * A streaming query restarted from a checkpoint written by the
    * single-state version will fail to decode (or misdecode) its state
    * store rows — restart such deployments with a FRESH checkpoint
    * (and a replayable source offset) rather than in place. */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    // interval-merge one event into the sorted disjoint fragment list:
    // `before` can no longer absorb t, the `overlap` prefix (0, 1 or 2
    // fragments) is within gap of t on either side and fuses with it
    def insert(frags: List[SessionState], t: Long,
               v: Double): List[SessionState] = {
      val (before, rest) = frags.span(f => f.end + gapMs < t)
      val (overlap, after) = rest.span(f => f.start - gapMs <= t)
      val merged =
        if (overlap.isEmpty) SessionState(t, t, 1, v)
        else SessionState(math.min(overlap.head.start, t),
          math.max(overlap.last.end, t),
          overlap.map(_.n).sum + 1, overlap.map(_.totalValue).sum + v)
      before ++ (merged :: after)
    }

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionFragments]): Iterator[UserSession] = {
      // batch execution has no watermark (the Try): everything is final
      val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L)
      val horizon = if (wm < 0) Long.MaxValue else wm
      var frags = state.getOption.map(_.frags).getOrElse(Nil)
      // timeout invocations deliver no rows; the same fold covers both
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        .foreach(e => frags = insert(frags, e.ts.getTime, e.value))
      val (ripe, open) = frags.partition(_.end + gapMs < horizon)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionFragments(open))
        // wake when the watermark passes the oldest fragment's close
        // point; clamp past the watermark (a timeout at or below it is
        // an IllegalArgumentException)
        state.setTimeoutTimestamp(
          math.max(open.map(_.end + gapMs).min, wm + 1))
      }
      ripe.sortBy(_.start).map(s =>
        UserSession(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.end), s.n, s.totalValue)).iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Batch-mode sessionization with identical semantics (window-function
    * formulation) — the oracle for the stateful variant and the
    * backfill path. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = gapMinutes * 60 * 1000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_id")
  }

  // ------------------------------------------------ streaming funnel

  case class FunnelState(pending: List[Event], anchors: List[Long])
  case class FunnelProgress(user_id: Long, depth: Int,
                            reached_ts: java.sql.Timestamp)

  /** Incremental step funnel: the streaming twin of
    * [[graft.operators.Cohorts.funnel]], emitting one progress row per
    * user each time they advance a step (depth = steps completed).
    *
    * Exactness under out-of-order arrival: an event can only anchor a
    * step once no earlier event can still arrive, so rows buffer in
    * per-user state until the watermark passes them and are folded into
    * the anchor chain in event-time order. The fold in ts order IS the
    * batch min-after semantics; events the engine admits late but
    * within the watermark land in the buffer and sort into place.
    * State is bounded by the watermark delay (the buffer never holds
    * rows older than it) plus one Long per completed step. */
  def funnelStream(events: Dataset[Event], steps: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val stepArr = steps.toArray

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
      val st = state.getOption.getOrElse(FunnelState(Nil, Nil))
      // batch execution has no watermark (the Try): everything is final
      val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L)
      val horizon = if (wm < 0) Long.MaxValue else wm
      val incoming = rows.filter(e => stepArr.contains(e.event_type)).toList
      val (ready, pending) = (st.pending ++ incoming)
        .partition(_.ts.getTime <= horizon)
      var anchors = st.anchors
      val out = List.newBuilder[FunnelProgress]
      ready.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val depth = anchors.length
        if (depth < stepArr.length && e.event_type == stepArr(depth) &&
            (depth == 0 || e.ts.getTime > anchors.last)) {
          anchors = anchors :+ e.ts.getTime
          out += FunnelProgress(userId, anchors.length, e.ts)
        }
      }
      // a completed chain needs no buffer; an empty user needs no state
      val keep = if (anchors.length == stepArr.length) Nil else pending
      if (keep.isEmpty && anchors.isEmpty) state.remove()
      else {
        state.update(FunnelState(keep, anchors))
        // wake when the watermark passes the oldest buffered row (all
        // buffered rows are > horizon, so this is always legal)
        if (keep.nonEmpty)
          state.setTimeoutTimestamp(keep.map(_.ts.getTime).min)
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming deduplication on event_id with a bounded state horizon:
    * duplicates arriving within the watermark window are dropped
    * exactly; state for ids older than the watermark is evicted (the
    * at-least-once-source → effectively-once-sink ingest pattern). */
  def dedupStream(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Session configs for the RocksDB state-store backend. The default
    * HDFS-backed provider keeps EVERY live state row on the executor
    * heap — fine for bounded demo windows, an OOM by construction when
    * 100 TB of events hold hundreds of millions of open sessions or
    * in-watermark dedup keys. RocksDB keeps the working set on local
    * disk with a block-cache in front, and changelog checkpointing
    * ships per-batch deltas instead of full snapshots. Apply BEFORE a
    * query starts (the provider is fixed at query start); see
    * [[withRocksDbStateStore]] for a scoped form. */
  val RocksDbStateStoreConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** A DERIVED session carrying the RocksDB state-store confs — the
    * race-free form for a SparkSession shared across threads. SQL
    * confs are session-global, so [[withRocksDbStateStore]]'s
    * set-then-restore around a body opens exactly the toggle window
    * [[DocStreams.evictionSession]] exists to avoid: an UNRELATED
    * streaming query another thread starts mid-window silently begins
    * on the RocksDB provider (fixed at its own query start), and one
    * started just after the restore silently loses it. Build sources
    * and start queries from the returned session (same SparkContext
    * and cached data; its OWN conf, temp views, and function registry
    * — native functions re-registered here for that reason). */
  def rocksDbSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    RocksDbStateStoreConfigs.foreach { case (k, v) => s.conf.set(k, v) }
    graft.functions.Registry.registerAll(s)
    s
  }

  /** Run `body` (start streaming queries inside it) with the RocksDB
    * state store, restoring the previous provider after.
    * SINGLE-THREADED scope only (tests, driver scripts): the toggle
    * mutates session-global confs, so any query a concurrent thread
    * starts from the same session during `body` nondeterministically
    * picks up — or misses — the provider. Processes with concurrent
    * query starts use [[rocksDbSession]] instead. */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val prev = RocksDbStateStoreConfigs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    RocksDbStateStoreConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // ---------------------------------------- transformWithState (Spark 4)

  case class ProfileState(n: Long, total: Double, maxTsMs: Long)
  case class UserProfile(user_id: Long, n_events: Long,
                         total_value: Double, last_ts: java.sql.Timestamp)

  /** Per-user incremental profile via `transformWithState` — Spark 4's
    * arbitrary-state API (the successor to mapGroupsWithState: typed
    * named state slots with per-slot TTL, timers, and RocksDB-backed
    * storage). The maintained profile (event count, value total,
    * newest event time) is the online feature-store shape: each
    * micro-batch updates only the touched keys and emits their fresh
    * rows (OutputMode.Update), so downstream sinks see a changelog of
    * profiles, never a recomputation. State is one fixed-size row per
    * user — bounded by |users|, not |events|; with the RocksDB
    * provider it lives off-heap ([[withRocksDbStateStore]]).
    *
    * Count and max updates are order-independent, so those fields'
    * converged state equals the batch aggregate bit-for-bit under any
    * trigger partitioning. `total` accumulates Double, and floating-
    * point addition is NOT order-independent — bit-exact parity with
    * the batch sum holds only when every partial sum is exactly
    * representable (integer-valued doubles, as the spec fixture uses
    * deliberately); for arbitrary values parity is approximate (ulp-
    * level). A money-grade profile would accumulate fixed-point cents
    * the way the e11 TWAP chain does and divide once on read. */
  class ProfileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserProfile] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[ProfileState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ProfileState]("profile",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ProfileState](),
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserProfile] = {
      var s = if (state.exists()) state.get() else ProfileState(0L, 0.0, 0L)
      rows.foreach { e =>
        s = ProfileState(s.n + 1, s.total + e.value,
          math.max(s.maxTsMs, e.ts.getTime))
      }
      state.update(s)
      Iterator.single(UserProfile(key, s.n, s.total,
        new java.sql.Timestamp(s.maxTsMs)))
    }
  }

  /** events → changelog of per-user profiles (one updated row per
    * touched user per trigger). */
  def userProfiles(events: Dataset[Event]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(),
        TimeMode.None(), OutputMode.Update())
  }

  /** The batch twin of [[userProfiles]]'s converged state. */
  def userProfilesBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"),
        max(col("ts")).as("last_ts"))

  /** Stream-static enrichment: each micro-batch hash-joins against the
    * static dimension — no state, the standard dimension-lookup shape
    * (the static side re-plans per batch, so a small dim broadcasts). */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(users, Seq("user_id"), "left_outer")

  /** Stream-stream interval join (attribution): every purchase matched
    * to same-user clicks within the trailing `windowMinutes`. Both sides
    * are watermarked, and the time-range condition bounds the state the
    * engine must hold (clicks older than purchase-watermark − window are
    * evicted) — the canonical watermarked stream-stream join shape. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      windowMinutes: Int = 15): DataFrame =
    purchases
      .selectExpr("event_id AS p_id", "ts AS p_ts",
        "user_id AS p_user", "value AS p_value")
      .withWatermark("p_ts", "10 minutes")
      .join(
        clicks.selectExpr("event_id AS c_id", "ts AS c_ts",
            "user_id AS c_user", "value AS c_value")
          .withWatermark("c_ts", "30 minutes"),
        expr(s"""p_user = c_user AND
                 c_ts >= p_ts - INTERVAL $windowMinutes MINUTES AND
                 c_ts <= p_ts"""))

  /** Continuous parquet sink with checkpointing: processes whatever is
    * currently available and stops. Re-invoking with the same
    * checkpoint resumes exactly where the last run stopped — the file
    * source tracks consumed files in the checkpoint, so restarts
    * neither drop nor duplicate rows (P7's idempotent-resume semantics
    * in streaming form). */
  def runIncremental(spark: SparkSession, srcDir: String, outDir: String,
                     checkpointDir: String): Unit = {
    val stream = readEventStream(spark, srcDir)
      .withColumn("event_date", to_date(col("ts")))
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Run a streaming DataFrame to completion against a memory sink
    * (file sources are finite here) and return the result table. */
  def runToMemory(stream: DataFrame, name: String,
                  outputMode: String = "append"): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    stream.sparkSession.table(name)
  }
}
