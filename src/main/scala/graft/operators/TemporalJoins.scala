package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal joins Spark has no native operator for — as-of join and
  * range join — re-expressed as compositions of existing operators
  * (the preference ladder's first rung: compose before custom plans),
  * in the shapes that scale.
  *
  * Both are checked against independent DuckDB formulations (a native
  * `ASOF JOIN`; an inequality join) rather than mirrored plans — a
  * stronger oracle than most queries get.
  */
object TemporalJoins {
  type Q = (SparkSession, String) => DataFrame

  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)"

  // ---------------------------------------------------------------------
  // 1. asof_join — latest right row at-or-before each left row
  // ---------------------------------------------------------------------

  /** As-of join: each purchase matched to the user's latest view at or
    * before the purchase time (NULL when none) — the
    * state-at-event-time lookup every event pipeline needs.
    *
    * Spark shape: UNION + running `last(ignoreNulls)` window, not a
    * join: tag right rows 0 and left rows 1, sort within each user by
    * (ts, tag) — right-before-left on ties makes the match inclusive —
    * and carry the last seen right timestamp forward. ONE shuffle + one
    * in-partition sort, zero join fanout, no per-row subquery; at 100 TB
    * this is the merge-join formulation of as-of without materializing
    * any pair. (A naive formulation is a non-equi join — BNLJ — or a
    * per-left-row aggregation; both explode.)
    *
    * The oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — an independent
    * implementation, not a mirrored plan. The right side is
    * pre-distinct on (user, ts) so the as-of pick is unique in both
    * engines.
    */
  /** The as-of core over arbitrary relations: left (event_id, user_id,
    * ts) rows each pick up the latest right (user_id, ts) at or before
    * them as `last_view_ts`. Exposed for the ScalaCheck brute-force
    * equivalence test. */
  private[graft] def asofOf(left: DataFrame, right: DataFrame): DataFrame = {
    val r = right.select(col("user_id"), col("ts")).distinct()
      .select(col("user_id"), col("ts"), lit(0).as("src"),
        lit(null).cast("long").as("event_id"), col("ts").as("r_ts"))
    val l = left.select(col("user_id"), col("ts"), lit(1).as("src"),
      col("event_id"), lit(null).cast("timestamp").as("r_ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("src"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("last_view_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("last_view_ts"))
  }

  val asofJoin: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    asofOf(
      e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      e.filter(col("event_type") === "view").select("user_id", "ts"))
      .orderBy("event_id")
  }
  val asofJoinSql: String =
    s"""WITH e AS (SELECT * FROM $EV),
       |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
       |v AS (SELECT DISTINCT user_id, ts FROM e WHERE event_type = 'view')
       |SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
       |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
       |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // 2. range_join_count — per-event count of rows in a trailing window
  // ---------------------------------------------------------------------

  private val RangeSecs = 21600L // 6-hour trailing window

  /** Range join: for each purchase, the number of the user's clicks in
    * the trailing [[RangeSecs]] window (zero-count purchases included).
    *
    * Spark shape: the bucketed range join. A raw interval condition is
    * a non-equi join — Spark would pick BroadcastNestedLoopJoin, a
    * disguised cartesian. Instead both sides bucket ts by the window
    * width; a click in [p.ts − W, p.ts] must land in the purchase's
    * bucket or the one before, so the purchase side probes exactly two
    * buckets (explode ×2) and the join is an EQUI-join on
    * (user, bucket) with the exact interval as a post-filter. Each
    * click matches at most one probe per purchase (buckets are
    * disjoint) — no double counting, no dedup pass. Fanout per key is
    * bounded by per-(user, window) event density — the operator's
    * natural skew measure — and AQE's skew-join splits any residual hot
    * (user, bucket). The plan is asserted cartesian-free in
    * PlanShapeSpec.
    */
  val rangeJoinCount: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val bucket = (t: org.apache.spark.sql.Column) =>
      expr(s"unix_micros(${t.toString}) div ${RangeSecs * 1000000L}")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), bucket(col("ts")).as("bk"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val probes = purchases
      .select(col("event_id"), col("user_id"), col("ts"),
        explode(array(bucket(col("ts")), bucket(col("ts")) - 1)).as("bk"))
    val counts = probes.join(clicks, Seq("user_id", "bk"))
      .filter(col("c_ts") >= col("ts") - expr(s"INTERVAL $RangeSecs SECONDS") &&
        col("c_ts") <= col("ts"))
      .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
    purchases.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("event_id")
  }
  val rangeJoinCountSql: String =
    s"""WITH e AS (SELECT * FROM $EV),
       |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, ts FROM e WHERE event_type = 'click')
       |SELECT p.event_id, p.user_id, count(c.ts) AS n_clicks
       |FROM p LEFT JOIN c
       |  ON c.user_id = p.user_id
       | AND c.ts >= p.ts - INTERVAL $RangeSecs SECOND AND c.ts <= p.ts
       |GROUP BY p.event_id, p.user_id
       |ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "asof_join" -> asofJoin,
    "range_join_count" -> rangeJoinCount,
  )
  val oracles: Map[String, String] = Map(
    "asof_join" -> asofJoinSql,
    "range_join_count" -> rangeJoinCountSql,
  )
}
