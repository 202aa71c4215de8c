package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over the events table: step funnels and
  * cohort retention — the two classic OLAP shapes an event pipeline
  * reports on top of the raw stream.
  *
  * Scale posture (100 TB): both operators shuffle on `user_id` only —
  * the funnel is a chain of per-user min-aggregates joined user-to-user
  * (each step's cohort only shrinks, so every join after the first is
  * a candidate broadcast), and retention is one window pass + one
  * distinct + one group-count, all on the same user partitioning.
  */
object Cohorts {

  /** Step funnel: users who performed `steps(0)`, then `steps(1)`
    * strictly after it, then `steps(2)` strictly after that, etc.
    * Per user, each step matches at its EARLIEST qualifying time (min
    * ts after the previous step's match) — the standard unordered-scan
    * funnel that needs no per-user event sorting.
    *
    * Returns one row: `n_step1 .. n_stepK` user counts. Monotonically
    * non-increasing by construction. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    // one frame per step; step i's frame builds on step i-1's (shared
    // lineage → Catalyst reuses the exchanges across the count branches)
    val frames = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) =>
        // the cohort can only shrink: joining events to the previous
        // step's (user, ts) frame keeps the shuffle bounded by the
        // event volume of THIS step's type, never all events
        events.where(col("event_type") === step)
          .join(prev.select(col("user_id"), col(s"t$i")), Seq("user_id"))
          .where(col("ts") > col(s"t$i"))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as(s"t${i + 1}"))
    }
    frames.zipWithIndex
      .map { case (f, i) => f.agg(count(col(s"t${i + 1}")).as(s"n_step${i + 1}")) }
      .reduce(_.crossJoin(_))
  }

  /** DuckDB twin of [[funnel]]: the identical chain of min-after CTEs.
    * The last CTE holds every step's timestamp (nulls never occur —
    * a user only appears once all steps matched), so the counts agg
    * mirrors the Spark plan 1:1. */
  def funnelSql(steps: Seq[String]): String = {
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events " +
          s"WHERE event_type = '$step' GROUP BY user_id)"
      else {
        val prevTs = (1 to i).map(j => s"MIN(p.t$j) AS t$j").mkString(", ")
        s"s${i + 1} AS (SELECT e.user_id, $prevTs, MIN(e.ts) AS t${i + 1} " +
          s"FROM events e JOIN s$i p USING (user_id) " +
          s"WHERE e.event_type = '$step' AND e.ts > p.t$i GROUP BY e.user_id)"
      }
    }
    val counts = (1 to steps.size).map(i =>
      s"(SELECT COUNT(t$i) FROM s$i) AS n_step$i").mkString(", ")
    s"WITH ${ctes.mkString(",\n")}\nSELECT $counts"
  }

  /** Weekly cohort retention: cohort = the week (integer index from
    * `epochDay`) of a user's first event; a user retains at offset k if
    * they have ANY event in cohort_week + k. Output
    * (cohort_week, week_offset, n_users). Week indices are pure integer
    * arithmetic on day differences — no engine-specific week-truncation
    * rules to disagree on. */
  def retention(events: DataFrame, epochDay: String): DataFrame = {
    val wk = events.select(col("user_id"),
      expr(s"datediff(to_date(ts), DATE '$epochDay') div 7").as("week"))
    wk.withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy(col("user_id"))))
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Gap-based sessionization: a user's events split into sessions
    * wherever the gap to the previous event exceeds `gapMinutes`.
    * Classic batch twin of streaming session windows
    * (`session_window` / `flatMapGroupsWithState` in streaming/).
    *
    * Returns one row per (user_id, session) with `n_events` and
    * `duration_us` (last-first, exact integer micros). One shuffle on
    * `user_id` total: the boundary flag (lag), the running session
    * index (sum over an unbounded-preceding frame on the SAME window
    * spec) and the per-session aggregate all reuse that partitioning —
    * at 100 TB the cost is the one event shuffle, same as any per-user
    * rollup. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    // event_id tiebreak: equal timestamps within a user must order the
    // same way in every engine or the running index diverges
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byTime) <= gapUs, 0)
          .otherwise(1)) // null lag (first event) lands here too
      .withColumn("session",
        sum(col("new_sess")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
  }

  /** DuckDB twin of [[sessionize]] — identical lag/running-sum chain.
    * An event exactly `gap` after its predecessor stays in the SAME
    * session (inclusive boundary) — which is also what Spark's built-in
    * `session_window` does (merge while next ≤ last + gap; pinned by
    * CohortsSpec's boundary test), so this twin serves both e8 and e9. */
  def sessionizeSql(gapMinutes: Int): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
       |m AS (
       |  SELECT user_id, event_id, ts_us,
       |         CASE WHEN ts_us - LAG(ts_us) OVER
       |                (PARTITION BY user_id ORDER BY ts_us, event_id)
       |              <= $gapUs THEN 0 ELSE 1 END AS new_sess
       |  FROM e),
       |s AS (
       |  SELECT user_id, ts_us,
       |         SUM(new_sess) OVER
       |           (PARTITION BY user_id ORDER BY ts_us, event_id
       |            ROWS UNBOUNDED PRECEDING) AS session
       |  FROM m),
       |g AS (
       |  SELECT user_id, session, COUNT(*) AS n_events,
       |         MAX(ts_us) - MIN(ts_us) AS duration_us
       |  FROM s GROUP BY 1, 2)""".stripMargin
  }

  /** DuckDB twin of [[retention]] — same integer week index. */
  def retentionSql(epochDay: String): String =
    s"""WITH wk AS (
       |  SELECT user_id,
       |         date_diff('day', DATE '$epochDay', CAST(ts AS DATE)) // 7 AS week
       |  FROM events),
       |c AS (
       |  SELECT DISTINCT user_id,
       |         MIN(week) OVER (PARTITION BY user_id) AS cohort_week,
       |         week - MIN(week) OVER (PARTITION BY user_id) AS week_offset
       |  FROM wk)
       |SELECT cohort_week, week_offset, COUNT(*) AS n_users
       |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
