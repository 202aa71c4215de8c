package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num

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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
