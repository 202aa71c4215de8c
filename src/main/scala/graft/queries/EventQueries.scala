package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num
import graft.operators.TemporalJoin

/** Event-stream analytics (batch view of the semantics the streaming
  * module runs incrementally — SURVEY §2.8): tumbling-window
  * aggregation and JSON property extraction.
  */
object EventQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour window aggregate (batch equivalent of
    // groupBy(window($"ts", "1 hour")) in streaming/).
    "e1_events_hourly" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("HOUR", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Num.sumExact(col("value")).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // X11: date/time scalar functions — day truncation, dow, date math
    "x11_events_daily" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("dow", dayofweek(col("ts")))
        .groupBy(col("day"), col("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("day"))
    }),

    // Semi-structured JSON column extraction (props is a JSON blob).
    "e2_events_props" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
             count(col("k")).as("n_with_k"))
        .orderBy(col("event_type"))
    }),

    // As-of join: each purchase looks up the user's latest prior click
    // (point-in-time feature lookup; union + window, zero joins).
    "e3_asof_purchase_click" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      TemporalJoin.asOfJoin(
          ev.where(col("event_type") === "purchase"),
          ev.where(col("event_type") === "click"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("asof_ts_us"),
          col("asof_value"))
        .orderBy(col("event_id"))
    }),

    // Interval join: clicks attributed into 10-minute windows opened by
    // high-value errors — keyless range join, blocked on time bins.
    "e4_interval_error_clicks" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val windows = ev
        .where(col("event_type") === "error" && col("value") > 100.0)
        .select(col("event_id").as("window_id"), col("ts").as("ws"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("we"))
      val points = ev.where(col("event_type") === "click")
        .select(col("ts"), col("value"))
      TemporalJoin.intervalJoin(windows, points, binMicros = 10L * 60 * 1000000)
    }),

    // Step funnel: signup → click strictly after → purchase strictly
    // after that; per-user min-after chain, one row of stage counts.
    "e6_funnel" -> ((s, dir) =>
      graft.operators.Cohorts.funnel(Tables.events(s, dir),
        Seq("signup", "click", "purchase"))),

    // Weekly cohort retention: cohort = week of first event (integer
    // week index — no engine-specific week truncation), retained at
    // offset k = any event in cohort_week + k.
    "e7_retention" -> ((s, dir) =>
      graft.operators.Cohorts.retention(Tables.events(s, dir), "2024-01-01")),

    // Gap-based sessionization (batch twin of streaming session
    // windows): 12-hour inactivity splits a user's events into sessions;
    // reported as a session-size histogram (bounded output at any SF).
    "e8_sessions" -> ((s, dir) => {
      graft.operators.Cohorts.sessionize(Tables.events(s, dir), gapMinutes = 720)
        .groupBy(col("n_events"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("duration_us")).as("total_duration_us"))
        .orderBy(col("n_events"))
    }),

    // Built-in session_window (the native operator e8 hand-rolls):
    // batch-mode gap sessions via groupBy(user, session_window). Its
    // boundary is inclusive — an event landing EXACTLY gap after the
    // previous one merges (pinned in CohortsSpec) — so it shares e8's
    // oracle twin. At scale this is the same single user_id shuffle as
    // e8, but the session assignment runs inside the aggregation
    // operator instead of a window pass.
    "e9_session_window_builtin" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "720 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("n_events"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_events"))
    }),

    // LOCF gap-filling (last observation carried forward): non-click
    // events have no reading here (synthesized nulls), and each row
    // carries the user's most recent non-null value — the standard
    // sensor/time-series repair, one window pass on the user shuffle.
    // E11: time-weighted average value per event type (the TWAP shape:
    // each observation holds until the next one; weight = interval
    // length). All accumulation is INTEGER — cents × exact micros
    // (unix_micros/epoch_us) — so the sums are order-independent, and
    // the only float math is one fixed division chain at the end.
    // (A decimal(38,2) accumulator was tried first: its →double cast
    // rounds differently in DuckDB — hugeint then /100.0, two
    // roundings — and hash-missed by 1 ulp.) Per-type windows only;
    // no single-partition stage.
    "e11_twap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .where(col("next_us").isNotNull)
        .withColumn("dt", col("next_us") - col("us"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          (sum(col("cents") * col("dt")).cast("double") / lit(100.0) /
            sum(col("dt")).cast("double")).as("twap"))
        .orderBy(col("event_type"))
    }),

    "e10_locf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .where(pmod(col("user_id"), lit(25)) === 0)
        .withColumn("reading",
          when(col("event_type") === "click", col("value")))
        .select(col("user_id"), col("event_id"),
          last(col("reading"), ignoreNulls = true).over(w).as("filled"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Same semantics written as the NAIVE range join — the
    // RangeJoinRule optimizer extension (plans/RangeJoinRule.scala)
    // rewrites it to the binned equi-join automatically; inner-join
    // semantics, so zero-match windows are absent here (vs e4).
    "e5_range_join_auto" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val windows = ev
        .where(col("event_type") === "error" && col("value") > 100.0)
        .select(col("event_id").as("window_id"), col("ts").as("ws"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("we"))
      val points = ev.where(col("event_type") === "click")
        .select(col("ts"), col("value"))
      windows.join(points,
          points("ts") >= windows("ws") && points("ts") < windows("we"))
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_events"),
          Num.sumExact(col("value")).as("total_value"))
        .orderBy(col("window_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "e1_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |  event_type, COUNT(*) AS n,
         |  ${Num.sqlSumExact("value")} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x11_events_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  dayofweek(ts) + 1 AS dow, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "e2_events_props" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_with_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e3_asof_purchase_click" ->
      TemporalJoin.asOfJoinSql(leftType = "purchase", rightType = "click"),

    "e4_interval_error_clicks" ->
      TemporalJoin.intervalJoinSql(windowType = "error", minValue = 100.0,
        pointType = "click", widthMinutes = 10),

    "e6_funnel" ->
      graft.operators.Cohorts.funnelSql(Seq("signup", "click", "purchase")),

    "e7_retention" ->
      graft.operators.Cohorts.retentionSql("2024-01-01"),

    "e8_sessions" ->
      s"""${graft.operators.Cohorts.sessionizeSql(gapMinutes = 720)}
         |SELECT n_events, COUNT(*) AS n_sessions,
         |       CAST(SUM(duration_us) AS BIGINT) AS total_duration_us
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "e9_session_window_builtin" ->
      s"""${graft.operators.Cohorts.sessionizeSql(gapMinutes = 720)}
         |SELECT n_events, COUNT(*) AS n_sessions
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "e11_twap" ->
      """WITH b AS (
        |  SELECT event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         epoch_us(ts) AS us
        |  FROM events),
        |i AS (
        |  SELECT event_type, cents, us,
        |         LEAD(us) OVER (PARTITION BY event_type
        |                        ORDER BY us, event_id) AS next_us
        |  FROM b)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |       CAST(CAST(SUM(cents * (next_us - us)) AS BIGINT) AS DOUBLE)
        |         / 100.0 / CAST(SUM(next_us - us) AS DOUBLE) AS twap
        |FROM i WHERE next_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e10_locf" ->
      """SELECT user_id, event_id,
        |  LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS filled
        |FROM events WHERE user_id % 25 = 0
        |ORDER BY user_id, event_id""".stripMargin,

    "e5_range_join_auto" ->
      s"""WITH w AS (SELECT event_id AS window_id, ts AS ws,
         |                  ts + INTERVAL 10 MINUTE AS we
         |           FROM events
         |           WHERE event_type = 'error' AND value > 100.0),
         |p AS (SELECT ts, value FROM events WHERE event_type = 'click')
         |SELECT w.window_id, COUNT(*) AS n_events,
         |       ${Num.sqlSumExact("p.value")} AS total_value
         |FROM w JOIN p ON p.ts >= w.ws AND p.ts < w.we
         |GROUP BY w.window_id ORDER BY w.window_id""".stripMargin
  )
}
