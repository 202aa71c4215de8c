package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Streaming semantics: batch/stream parity for windowed aggregation,
  * sessionization gap logic (stateful vs window-function oracle).
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val eventsDir: String = {
    // stage the events table alone in a directory (streaming file source
    // reads a whole dir; testdata mixes all tables in one)
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling window equals the batch aggregation") {
    val stream = EventStreams.readEventStream(spark, eventsDir)
    val got = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "tumbling_out")
      .select("window_start", "event_type", "n", "total_value")

    val batch = EventStreams.tumblingCounts(
      spark.read.parquet(eventsDir))
      .select("window_start", "event_type", "n", "total_value")

    // append mode only emits windows the watermark has passed: the last
    // windows (end > maxTs - 10min) stay open in a finite run. Everything
    // emitted must match batch; everything unemitted must be in the
    // still-open horizon.
    val g = got.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(g.subsetOf(b))
    assert(g.nonEmpty)
    val maxTs = spark.read.parquet(eventsDir)
      .agg(max(col("ts"))).first().getTimestamp(0).getTime
    val horizon = maxTs - 10 * 60 * 1000
    val unemitted = b -- g
    val windowEnd = batch.collect().map(r =>
      r.toSeq -> (r.getAs[java.sql.Timestamp]("window_start").getTime + 3600 * 1000)).toMap
    assert(unemitted.forall(w => windowEnd(w) > horizon),
      s"windows missing from the stream output outside the open horizon: " +
        s"${unemitted.filter(w => windowEnd(w) <= horizon).take(3)}")
  }

  test("stateful sessionization matches the window-function batch oracle") {
    val ev = spark.read.parquet(eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]

    val streamed = EventStreams.sessionize(ev, gapMinutes = 30)
    // run via the batch execution of flatMapGroupsWithState
    val got = streamed.collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
      .toSet

    val oracle = EventStreams.sessionizeBatch(spark.read.parquet(eventsDir),
        gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getInt(3)))
      .toSet

    // batch execution has no watermark, so every session is final and
    // the stateful operator must equal the oracle EXACTLY — including
    // each user's last session, which the pre-fragment formulation
    // parked in never-fired timeout state
    assert(got === oracle)
    assert(got.nonEmpty)
  }

  test("sessionize is watermark-exact under cross-trigger disorder: late extend and late bridge match the batch oracle") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1720000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_disorder_out")
      .outputMode("append").start()
    try {
      // user 2: two fragments [0,0] and [31,31] (gap 31 > 30) that an
      // eager emitter closes separately IN-trigger — then a late
      // BRIDGE at 25 (admissible: watermark is ts(21)) that the batch
      // semantics merge into ONE session [0,31]
      input.addData(
        EventStreams.Event(3, ts(0), 2, "view", 1.0),
        EventStreams.Event(4, ts(31), 2, "view", 2.0))
      q.processAllAvailable() // watermark now ts(21)
      assert(spark.table("sess_disorder_out").isEmpty,
        "nothing may close while a bridging arrival is still admissible")
      // user 1: a session [100, 110]; the bridge rides the same trigger
      input.addData(
        EventStreams.Event(6, ts(25), 2, "view", 4.0),    // late bridge
        EventStreams.Event(1, ts(100), 1, "click", 1.0),
        EventStreams.Event(2, ts(110), 1, "click", 2.0))
      q.processAllAvailable() // watermark now ts(100)
      // late INTERIOR event at 105 (admissible, >= ts(100)) — the
      // broken formulation moved the session end BACKWARD to 105
      input.addData(EventStreams.Event(5, ts(105), 1, "click", 4.0))
      q.processAllAvailable()
      // push the watermark far past every close point → timeouts fire
      input.addData(EventStreams.Event(7, ts(500), 3, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("sess_disorder_out")
        .as[EventStreams.UserSession].collect()
        .map(s => (s.user_id, s.session_start.getTime,
          s.session_end.getTime, s.n_events, s.total_value)).toSet
      assert(got === Set(
        (1L, ts(100).getTime, ts(110).getTime, 3, 7.0),
        (2L, ts(0).getTime, ts(31).getTime, 3, 7.0)), got)
    } finally q.stop()
  }

  test("incremental sink: checkpoint resume neither drops nor duplicates (P7)") {
    val src = java.nio.file.Files.createTempDirectory("inc_src").toString
    val out = java.nio.file.Files.createTempDirectory("inc_out").toString
    val ckp = java.nio.file.Files.createTempDirectory("inc_ckp").toString
    val all = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")

    // first half arrives → run 1
    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    EventStreams.runIncremental(spark, src, out, ckp)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === all.where(col("event_id") % 2 === 0).count())

    // second half arrives → run 2 resumes from the checkpoint
    all.where(col("event_id") % 2 =!= 0).write.mode("append").parquet(src)
    EventStreams.runIncremental(spark, src, out, ckp)
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect()
    assert(ids.length === all.count())        // nothing dropped
    assert(ids.distinct.length === ids.length) // nothing duplicated

    // run 3 with nothing new: no-op
    EventStreams.runIncremental(spark, src, out, ckp)
    assert(spark.read.parquet(out).count() === all.count())
  }

  test("true streaming sessionization: event-time timeout closes sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_stream_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1, two events 5 min apart → one open session
      input.addData(EventStreams.Event(1, ts(0), 1, "click", 1.0),
        EventStreams.Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_stream_out").isEmpty) // still open

      // batch 2: user 2 far in the future → watermark advances to
      // ts(110), past user 1's timeout at ts(35)
      input.addData(EventStreams.Event(3, ts(120), 2, "click", 4.0))
      q.processAllAvailable()
      // batch 3: timeouts fire against the batch-2 watermark
      input.addData(EventStreams.Event(4, ts(125), 2, "click", 8.0))
      q.processAllAvailable()

      val out = spark.table("sess_stream_out").as[EventStreams.UserSession].collect()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length === 1, s"expected user 1's session closed by timeout, got ${out.toSeq}")
      assert(u1.head.n_events === 2 && u1.head.total_value === 3.0)
      assert(u1.head.session_start.getTime === t0 && u1.head.session_end.getTime === ts(5).getTime)
    } finally q.stop()
  }

  test("transformWithState profiles: cross-batch state converges to the batch aggregate, update-mode changelog") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)
    // whole-number values so streaming/batch double sums are exact
    val batches = Seq(
      Seq(EventStreams.Event(1, ts(0), 1, "click", 2.0),
          EventStreams.Event(2, ts(5), 1, "view", 3.0),
          EventStreams.Event(3, ts(1), 2, "click", 10.0)),
      Seq(EventStreams.Event(4, ts(9), 1, "buy", 5.0)),
      Seq(EventStreams.Event(5, ts(0), 2, "view", 1.0), // late arrival
          EventStreams.Event(6, ts(20), 3, "click", 7.0)))
    EventStreams.withRocksDbStateStore(spark) {
      val input = MemoryStream[EventStreams.Event]
      val q = EventStreams.userProfiles(input.toDS())
        .writeStream.format("memory").queryName("twst_profiles")
        .outputMode("update").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val rows = spark.table("twst_profiles")
          .as[EventStreams.UserProfile].collect()
        // update-mode changelog: user 1 touched in 2 triggers → 2 rows
        assert(rows.count(_.user_id == 1L) === 2)
        // the LAST row per user (largest n_events — counts only grow)
        // is the converged profile and must equal the batch aggregate
        val last = rows.groupBy(_.user_id).view
          .mapValues(_.maxBy(_.n_events)).toMap
        val all = batches.flatten.toDF()
        val want = EventStreams.userProfilesBatch(all).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
            r.getTimestamp(3)))).toMap
        assert(last.keySet === want.keySet)
        last.foreach { case (u, p) =>
          assert((p.n_events, p.total_value, p.last_ts) === want(u), s"user $u") }
        // late arrival did not regress user 2's newest-event time
        assert(last(2L).last_ts.getTime === ts(1).getTime)
      } finally q.stop()
    }
  }

  test("native session_window stream: closed sessions carry the +gap end, cross-batch merge works") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1720000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionWindowCounts(input.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sw_stream_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 two events 5 min apart — session open
      input.addData(EventStreams.Event(1, ts(0), 1, "click", 1.0),
        EventStreams.Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      // batch 2: user 1 continues at ts(20) (cross-batch merge into the
      // same session); user 2 at ts(120) advances the watermark past
      // user 1's session end (ts(20)+30min=ts(50) < ts(110))
      input.addData(EventStreams.Event(3, ts(20), 1, "click", 3.0),
        EventStreams.Event(4, ts(120), 2, "click", 4.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(5, ts(125), 2, "click", 5.0))
      q.processAllAvailable()

      val out = spark.table("sw_stream_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3)))
      val u1 = out.filter(_._1 == 1L)
      assert(u1.length === 1, s"user 1's merged session should be closed: ${out.toSeq}")
      // session_window's end = last event + gap (vs the custom-state
      // operator which reports the last EVENT time) — pin the contract
      assert(u1.head === ((1L, t0, ts(20 + 30).getTime, 3L)))
    } finally q.stop()
  }

  test("multi-batch sessionization: watermark advance, cross-batch merge, late row dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1710000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_multi_out")
      .outputMode("append").start()
    try {
      // trigger 1: user 1 (two events), user 3 (one) — all sessions open
      input.addData(
        EventStreams.Event(1, ts(0), 1, "click", 1.0),
        EventStreams.Event(2, ts(5), 1, "click", 2.0),
        EventStreams.Event(3, ts(2), 3, "view", 5.0))
      q.processAllAvailable()
      assert(spark.table("sess_multi_out").isEmpty)

      // trigger 2: user 1 continues within the gap (cross-batch state
      // merge); user 2 far ahead pushes the watermark to ts(110). The
      // engine's trailing no-data micro-batch then fires the timeouts
      // for users 1 and 3 (session ends ts(8)/ts(2) + 30min < ts(110))
      input.addData(
        EventStreams.Event(4, ts(8), 1, "click", 4.0),
        EventStreams.Event(5, ts(120), 2, "click", 8.0))
      q.processAllAvailable()
      assert(spark.table("sess_multi_out").count() === 2)

      // trigger 3: user 4's row is LATE (ts(15) < watermark ts(110)) and
      // must be dropped without creating state or output
      input.addData(
        EventStreams.Event(6, ts(125), 2, "click", 16.0),
        EventStreams.Event(7, ts(15), 4, "late", 99.0))
      q.processAllAvailable()

      val out = spark.table("sess_multi_out").as[EventStreams.UserSession].collect()
      assert(out.map(_.user_id).sorted.toSeq === Seq(1L, 3L), s"got ${out.toSeq}")
      val u1 = out.find(_.user_id == 1L).get
      assert(u1.n_events === 3 && u1.total_value === 7.0)
      assert(u1.session_start.getTime === ts(0).getTime &&
        u1.session_end.getTime === ts(8).getTime)
      val u3 = out.find(_.user_id == 3L).get
      assert(u3.n_events === 1 && u3.total_value === 5.0)
      // user 2's session is still open; user 4's late row left no trace
      assert(!out.exists(_.user_id == 2L) && !out.exists(_.user_id == 4L))
    } finally q.stop()
  }

  test("streaming funnel: cross-batch anchors, out-of-order buffering, late rows dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1720000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(input.toDS(),
        Seq("signup", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_stream_out")
      .outputMode("append").start()
    try {
      // batch 1: u1's purchase arrives BEFORE its click exists; u2 signs
      // up. The trailing micro-batch advances the watermark to ts 15, so
      // the signups (≤ 15) fold to depth 1 while u1's purchase@25 stays
      // buffered — it cannot anchor ahead of a click that may still come.
      input.addData(
        EventStreams.Event(1, ts(0), 1, "signup", 0),
        EventStreams.Event(2, ts(25), 1, "purchase", 0),
        EventStreams.Event(3, ts(5), 2, "signup", 0))
      q.processAllAvailable()
      val b1 = spark.table("funnel_stream_out")
        .as[EventStreams.FunnelProgress].collect()
      assert(b1.map(p => p.user_id -> p.depth).sorted.toSeq ===
        Seq(1L -> 1, 2L -> 1))

      // batch 2: the missing click lands (ts 18 — still above the
      // batch-1 watermark of ts 15) plus a far-future u3 signup that
      // drives the watermark to ts 90; the trailing micro-batch then
      // folds u1's buffered rows IN TS ORDER: signup@0 → click@18 →
      // purchase@25, full depth 3 despite the out-of-order arrival
      input.addData(
        EventStreams.Event(4, ts(18), 1, "click", 0),
        EventStreams.Event(5, ts(100), 3, "signup", 0))
      q.processAllAvailable()
      val mid = spark.table("funnel_stream_out")
        .as[EventStreams.FunnelProgress].collect()
      assert(mid.filter(_.user_id == 1L).map(_.depth).sorted.toSeq === Seq(1, 2, 3))
      assert(mid.filter(_.user_id == 2L).map(_.depth).toSeq === Seq(1))

      // batch 3: u2's click@4 is LATE (< watermark 90) → dropped, u2
      // stays at depth 1; u4's purchase-with-no-signup never advances
      input.addData(
        EventStreams.Event(6, ts(4), 2, "click", 0),
        EventStreams.Event(7, ts(95), 4, "purchase", 0),
        EventStreams.Event(8, ts(200), 5, "signup", 0))
      q.processAllAvailable()

      val out = spark.table("funnel_stream_out")
        .as[EventStreams.FunnelProgress].collect()
      val u1 = out.filter(_.user_id == 1L).sortBy(_.depth)
      assert(u1.map(_.depth).toSeq === Seq(1, 2, 3))
      assert(u1.map(_.reached_ts.getTime).toSeq ===
        Seq(ts(0), ts(18), ts(25)).map(_.getTime))
      assert(out.filter(_.user_id == 2L).map(_.depth).toSeq === Seq(1))
      assert(!out.exists(_.user_id == 4L)) // purchase before signup: no depth
      assert(!out.exists(_.user_id == 5L)) // still above the watermark
    } finally q.stop()
  }

  test("funnelStream in batch mode reproduces the batch funnel stage counts") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .as[EventStreams.Event]
    val steps = Seq("signup", "click", "purchase")
    val byDepth = EventStreams.funnelStream(ev, steps)
      .groupBy(col("depth")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = graft.operators.Cohorts.funnel(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"), steps)
      .collect()(0)
    // a user reaching depth k emitted one row per depth 1..k, so the
    // per-depth row counts are exactly the funnel's stage counts
    assert(byDepth.getOrElse(1, 0L) === want.getLong(0))
    assert(byDepth.getOrElse(2, 0L) === want.getLong(1))
    assert(byDepth.getOrElse(3, 0L) === want.getLong(2))
  }

  test("streaming dedup: cross-batch duplicates within the watermark are dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1720000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_stream_out")
      .outputMode("append").start()
    try {
      input.addData(
        EventStreams.Event(1, ts(0), 1, "click", 1.0),
        EventStreams.Event(2, ts(1), 1, "click", 2.0),
        EventStreams.Event(1, ts(0), 1, "click", 1.0)) // in-batch dup
      q.processAllAvailable()
      // cross-batch dup of id 2 arrives within the watermark → dropped
      input.addData(
        EventStreams.Event(2, ts(1), 1, "click", 2.0),
        EventStreams.Event(3, ts(2), 1, "click", 4.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream_out")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("rocksDbSession isolates the provider confs from the parent session (no toggle window)") {
    val s = EventStreams.rocksDbSession(spark)
    EventStreams.RocksDbStateStoreConfigs.foreach { case (k, v) =>
      assert(s.conf.get(k) === v, k)
    }
    // the parent's provider conf is NOT mutated by deriving the session
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").forall(
      !_.contains("RocksDB")),
      "deriving a RocksDB session must not flip the parent's provider")
    // native functions are registered in the derived session (its
    // registry is isolated — the evictionSession rule)
    import s.implicits._
    assert(s.sql("SELECT size(shingle_hashes(array('a','b','c'), 2))")
      .as[Int].head() === 2)
  }

  test("state scale: 120k events over 6 triggers on RocksDB — watermark keeps state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    EventStreams.withRocksDbStateStore(spark) {
      val input = MemoryStream[EventStreams.Event]
      val checkpoint = java.nio.file.Files.createTempDirectory("rocks_ck").toString
      val q = EventStreams.dedupStream(input.toDS().toDF())
        .writeStream.format("memory").queryName("rocks_dedup_out")
        .option("checkpointLocation", checkpoint)
        .outputMode("append").start()
      try {
        val t0 = 1720000000000L
        val batches = 6
        val perBatch = 20000
        val stateSizes = (0 until batches).map { b =>
          // each trigger advances event time by 1h, so the 10-minute
          // watermark evicts every previous trigger's dedup keys
          val base = t0 + b * 3600000L
          input.addData((0 until perBatch).map { i =>
            val id = b.toLong * perBatch + i
            EventStreams.Event(id, new java.sql.Timestamp(base + i), id % 1000,
              "click", 1.0)
          })
          q.processAllAvailable()
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        }
        // nothing lost: all ids distinct, so every event passes dedup
        assert(spark.table("rocks_dedup_out").count() === batches.toLong * perBatch)
        // bounded state: each trigger's final state holds ONE trigger's
        // keys, never the accumulated corpus — the plateau IS the
        // evidence eviction works (vs 120k without a watermark)
        assert(stateSizes.last <= 2L * perBatch,
          s"state grew with the corpus: $stateSizes")
        assert(stateSizes.max <= 2L * perBatch, s"state spiked: $stateSizes")
        // the RocksDB provider is really serving the query
        val custom = q.lastProgress.stateOperators.head.customMetrics
        import scala.jdk.CollectionConverters._
        assert(custom.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb metrics, got ${custom.keySet.asScala.mkString(", ")}")
      } finally q.stop()
    }
  }

  test("stream-static enrichment joins each micro-batch to the dimension") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1720000000000L
    val users = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .enrichWithUsers(input.toDS().toDF(), users)
      .writeStream.format("memory").queryName("enrich_stream_out")
      .outputMode("append").start()
    try {
      input.addData(
        EventStreams.Event(1, new java.sql.Timestamp(t0), 1, "click", 1.0),
        EventStreams.Event(2, new java.sql.Timestamp(t0), 9, "click", 2.0))
      q.processAllAvailable()
      val byId = spark.table("enrich_stream_out")
        .select("event_id", "name").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(byId === Map(1L -> Some("alice"), 2L -> None)) // unknown user kept
    } finally q.stop()
  }

  test("stream-stream attribution join: in-window clicks match, out-of-window don't") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1730000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)

    val clicks = MemoryStream[EventStreams.Event]
    val purchases = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .attributionJoin(purchases.toDS().toDF(), clicks.toDS().toDF(),
        windowMinutes = 15)
      .writeStream.format("memory").queryName("attr_stream_out")
      .outputMode("append").start()
    try {
      // batch 1: clicks only — nothing joins yet
      clicks.addData(
        EventStreams.Event(1, ts(0), 1, "click", 1.0),
        EventStreams.Event(2, ts(50), 1, "click", 2.0), // outside any window
        EventStreams.Event(3, ts(5), 2, "click", 4.0))  // other user
      q.processAllAvailable()
      // batch 2: purchase at t10 → joins user 1's click at t0 (within
      // 15 min) but not the t50 click (after) nor user 2's
      purchases.addData(EventStreams.Event(10, ts(10), 1, "purchase", 8.0))
      q.processAllAvailable()
      val rows = spark.table("attr_stream_out")
        .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((10L, 1L)))
    } finally q.stop()
  }

  test("sessionization: explicit gap fixture") {
    val t0 = 1700000000000L
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000)
    val ev = Seq(
      EventStreams.Event(1, ts(0), 7, "click", 1.0),
      EventStreams.Event(2, ts(10), 7, "click", 2.0),
      EventStreams.Event(3, ts(120), 7, "click", 4.0), // 110-min gap → new session
      EventStreams.Event(4, ts(125), 7, "click", 8.0)).toDS()
    val sessions = EventStreams.sessionizeBatch(ev.toDF(), gapMinutes = 30)
      .orderBy("session_start").collect()
    assert(sessions.length === 2)
    assert(sessions(0).getAs[Int]("n_events") === 2)
    assert(sessions(0).getAs[Double]("total_value") === 3.0)
    assert(sessions(1).getAs[Int]("n_events") === 2)
    assert(sessions(1).getAs[Double]("total_value") === 12.0)
  }
}
