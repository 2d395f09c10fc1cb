package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time windowed aggregations — absent from the reference (its
  * state is per-key last-value only, SURVEY §2.8 "Windows: none") but
  * required for the 100 TB analytics goal; declared in SURVEY §7/§2.10.
  *
  * Batch forms are oracle-checked; the streaming twin (same `window()`
  * expression over `readStream` + watermark) is WindowsStreamSpec.
  * Window aggregation is a plain hash aggregate on (window, keys) —
  * map-side combinable, one shuffle; sliding windows multiply input by
  * (length/slide), visible and bounded in the plan, never a state
  * explosion.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** Decimal-pinned double sum (order-independent across partials). */
  private def sumd(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,10)")).cast("double")

  /** Tumbling 6-hour windows per event type: count + exact value sum. */
  val tumblingWindowAgg: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")
  val tumblingWindowAggSql: String =
    s"""SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP) AS w_start, event_type,
       |       count(*) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sum_value
       |FROM $EV GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Sliding windows: 6-hour length, 3-hour slide — each event lands in
    * exactly 2 windows. Oracle expands the membership explicitly. */
  val slidingWindowAgg: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
      .orderBy("w_start")
  val slidingWindowAggSql: String =
    s"""SELECT w_start, count(*) AS n FROM (
       |  SELECT CAST(to_timestamp(floor(epoch(ts) / 10800) * 10800) AS TIMESTAMP) AS w_start FROM $EV
       |  UNION ALL
       |  SELECT CAST(to_timestamp((floor(epoch(ts) / 10800) - 1) * 10800) AS TIMESTAMP) AS w_start FROM $EV)
       |GROUP BY w_start ORDER BY w_start""".stripMargin

  /** Session windows per user, 1-hour inactivity gap: Spark's
    * `session_window` vs the classic gaps-and-islands SQL (lag → new-
    * session flag → running island id) in the oracle — same result,
    * which is itself worth proving, since session_window is the one
    * windowing primitive with merge semantics. */
  val sessionWindowAgg: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"), col("sum_value"))
      .orderBy("user_id", "session_start")
  val sessionWindowAggSql: String =
    s"""SELECT user_id, min(ts) AS session_start, count(*) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sum_value
       |FROM (
       |  SELECT user_id, ts, value,
       |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM (
       |    SELECT user_id, ts, value, event_id,
       |           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |                     <= INTERVAL 1 HOUR THEN 0 ELSE 1 END AS new_session
       |    FROM $EV))
       |GROUP BY user_id, island ORDER BY user_id, session_start""".stripMargin

  val queries: Map[String, Q] = Map(
    "tumbling_window_agg" -> tumblingWindowAgg,
    "sliding_window_agg" -> slidingWindowAgg,
    "session_window_agg" -> sessionWindowAgg,
  )
  val oracles: Map[String, String] = Map(
    "tumbling_window_agg" -> tumblingWindowAggSql,
    "sliding_window_agg" -> slidingWindowAggSql,
    "session_window_agg" -> sessionWindowAggSql,
  )
}
