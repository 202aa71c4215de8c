package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Num

/** Temporal joins over event streams — the two join shapes a training
  * pipeline needs that vanilla equi-joins can't express:
  *
  *  - as-of join (point-in-time lookup): for each left event, the
  *    latest right event at-or-before it per key. Joining feature
  *    snapshots to training examples without leakage is exactly this.
  *  - interval join: points matched into [start, end) windows with no
  *    shared key. Attribution, incident correlation, sensor alignment.
  *
  * Both are formulated so NO cross product ever materializes:
  * the as-of join is a union + one window pass (zero joins — the
  * sort-merge the cluster would do anyway IS the answer), and the
  * interval join blocks on fixed-width time bins (same trick as the
  * MinHash band join: candidates only meet inside a bucket), then
  * applies the exact range predicate inside the bucket.
  */
object TemporalJoin {

  /** Latest right row at-or-before each left row, per key.
    *
    * Spark-first shape: tag the two inputs, union, and take a
    * `last(..., ignoreNulls)` over a (key, ts)-sorted window. One
    * shuffle by key, no join operator at all — at 100× this is strictly
    * cheaper than the sort-merge-band joins as-of is usually compiled
    * to, and it cannot skew worse than the key distribution itself.
    *
    * Tie rules (pinned by the oracle): a right row at exactly the left
    * ts matches (`<=`); among right ties the highest `event_id` wins.
    *
    * Inputs need columns (`keyCol`, `tsCol`, `event_id`, `value`).
    * Output: left `event_id`/key/ts plus `asof_ts`/`asof_value` of the
    * matched right row (nulls when no right row precedes the left). */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol), col("event_id"),
      lit(null).cast("double").as("_r_value"), lit(0).as("_side"))
    val r = right.select(col(keyCol), col(tsCol), col("event_id"),
      col("value").as("_r_value"), lit(1).as("_side"))
    // right rows sort BEFORE a left row at the same ts (_side desc) →
    // `<=` semantics; event_id breaks right-side ties deterministically
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), desc("_side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def lastRight(c: Column) =
      last(when(col("_side") === 1, c), ignoreNulls = true).over(w)
    r.unionByName(l)
      .withColumn("asof_ts", lastRight(col(tsCol)))
      .withColumn("asof_value", lastRight(col("_r_value")))
      .where(col("_side") === 0)
      .select(col("event_id"), col(keyCol), col(tsCol),
        col("asof_ts"), col("asof_value"))
  }

  /** DuckDB oracle for [[asOfJoin]]: the identical union + window
    * formulation (LAST_VALUE ... IGNORE NULLS over the same sort), so
    * tie decisions match row-for-row. Timestamps are emitted as epoch
    * micros (BIGINT) on both sides — engine-neutral serialization. */
  def asOfJoinSql(leftType: String, rightType: String): String =
    s"""WITH u AS (
       |  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS r_value, 0 AS side
       |  FROM events WHERE event_type = '$leftType'
       |  UNION ALL
       |  SELECT user_id, ts, event_id, value AS r_value, 1 AS side
       |  FROM events WHERE event_type = '$rightType'),
       |x AS (
       |  SELECT user_id, ts, event_id, side,
       |    LAST_VALUE(CASE WHEN side = 1 THEN ts END IGNORE NULLS) OVER w AS asof_ts,
       |    LAST_VALUE(CASE WHEN side = 1 THEN r_value END IGNORE NULLS) OVER w AS asof_value
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side DESC, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |       epoch_us(asof_ts) AS asof_ts_us, asof_value
       |FROM x WHERE side = 0 ORDER BY event_id""".stripMargin

  /** Points matched into [start, end) windows with NO shared key —
    * blocked on fixed-width time bins so the only join is an equi-join
    * on `bin`. A window of width ≤ binWidth spans at most two bins and
    * each point lives in exactly one, so no pair is seen twice and the
    * shuffle volume is (windows × ≤2) + points, never windows × points.
    * Windows that match nothing are kept (left re-join), count 0 and
    * null total — SQL LEFT JOIN aggregate semantics. */
  def intervalJoin(windows: DataFrame, points: DataFrame,
                   binMicros: Long): DataFrame = {
    val wb = windows
      .withColumn("_b0", floor(unix_micros(col("ws")) / binMicros))
      // clamp to >= _b0: sequence(start, stop) DESCENDS when stop < start,
      // so a degenerate window (we <= ws) would explode into spurious bins
      // (or overflow sequence's max length) instead of matching nothing —
      // same clamp RangeJoinRule applies via Greatest
      .withColumn("_b1", greatest(col("_b0"),
        floor((unix_micros(col("we")) - 1) / binMicros)))
      .withColumn("bin", explode(sequence(col("_b0"), col("_b1"))))
    val pb = points.withColumn("bin", floor(unix_micros(col("ts")) / binMicros))
    val counts = wb.join(pb, Seq("bin"))
      .where(col("ts") >= col("ws") && col("ts") < col("we"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        Num.sumExact(col("value")).as("total_value"))
    windows.select(col("window_id"))
      .join(counts, Seq("window_id"), "left_outer")
      .na.fill(0L, Seq("n_events"))
      .orderBy(col("window_id"))
  }

  /** DuckDB oracle for the interval join: the naive range-predicate
    * LEFT JOIN — correct by construction, quadratic by construction.
    * The Spark side must produce identical rows from the bucketed plan. */
  def intervalJoinSql(windowType: String, minValue: Double,
                      pointType: String, widthMinutes: Int): String =
    s"""WITH w AS (SELECT event_id AS window_id, ts AS ws,
       |                  ts + INTERVAL $widthMinutes MINUTE AS we
       |           FROM events
       |           WHERE event_type = '$windowType' AND value > $minValue),
       |p AS (SELECT ts, value FROM events WHERE event_type = '$pointType')
       |SELECT w.window_id, COUNT(p.ts) AS n_events,
       |       ${Num.sqlSumExact("p.value")} AS total_value
       |FROM w LEFT JOIN p ON p.ts >= w.ws AND p.ts < w.we
       |GROUP BY w.window_id ORDER BY w.window_id""".stripMargin
}
