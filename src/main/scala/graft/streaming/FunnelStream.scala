package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event entering the funnel tracker. */
final case class FunnelEvent(userId: Long, ts: Timestamp, eventId: Long,
  eventType: String)

/** One step completion: `userId` completed 1-based `step` at `t`.
  * Emitted at most once per (user, step) over the stream's lifetime —
  * append-safe by construction. */
final case class StepCompletion(userId: Long, step: Long, t: Timestamp)

/** Streaming twin of the batch `funnel_report` (X104) — the
  * view → click → purchase conversion funnel maintained continuously
  * at ingest. Per-user state is the step-completion time vector (the
  * verdict-r18 design: O(users) tuples); an in-order arrival of step
  * k's type, strictly after the user's step-(k−1) completion and with
  * step k still open, completes the step and emits ONE
  * [[StepCompletion]]. Processing in (ts, event_id) order makes the
  * stream's first qualifying event per step exactly the batch query's
  * `min(ts)` earliest-qualifying semantics, so per-step user counts —
  * and the report read through the batch's own conversion tail
  * ([[graft.operators.Windows.funnelReportOfCounts]], parity by
  * shared code) — equal batch bit-for-bit ([[FunnelStreamSpec]]).
  *
  * Delivery contract: [[Scd2Stream]]'s ordered keyed CDC — step
  * completion is order-sensitive (an out-of-order earlier event could
  * retroactively qualify a step), so the tracker requires PER-KEY
  * ordered delivery and skips anything at or before its (ts, event_id)
  * watermark as an idempotent replay; at-least-once prefix redelivery
  * converges bit-identically and re-emits nothing (the spec proves
  * both).
  *
  * Scale shape: O(users) state, one small fixed-width vector each
  * (steps are a compile-time list); lifetime emission ≤ users × steps.
  */
object FunnelStream {

  private val Steps = graft.operators.Windows.funnelStepNames

  private def micros(ts: Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** (lastTsMicros, lastId, completion micros per step — Long.MinValue
    * while a step is open). */
  private type St = (Long, Long, Array[Long])

  def completions(events: Dataset[FunnelEvent]): Dataset[StepCompletion] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stepOf: Map[String, Int] = Steps.zipWithIndex.toMap
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[St, StepCompletion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, incoming, state: GroupState[St]) =>
          var (lastTs, lastId, tms) = state.getOption.getOrElse(
            (Long.MinValue, Long.MinValue, Array.fill(Steps.length)(Long.MinValue)))
          val out = scala.collection.mutable.ArrayBuffer.empty[StepCompletion]
          incoming.toSeq.sortBy(e => (micros(e.ts), e.eventId)).foreach { e =>
            val t = micros(e.ts)
            // replay gate: at-or-before the watermark = already folded
            if (t > lastTs || (t == lastTs && e.eventId > lastId)) {
              stepOf.get(e.eventType).foreach { k =>
                val gateOpen = tms(k) == Long.MinValue &&
                  (k == 0 || (tms(k - 1) != Long.MinValue && t > tms(k - 1)))
                if (gateOpen) {
                  tms = tms.clone() // state tuples must not alias emitted history
                  tms(k) = t
                  out += StepCompletion(user, k + 1L, fromMicros(t))
                }
              }
              lastTs = t; lastId = e.eventId
            }
          }
          state.update((lastTs, lastId, tms))
          out.iterator
      }
  }

  /** The funnel report from a materialized completion relation — per-
    * step user counts (every step listed, zero-user steps included)
    * through the batch query's own conversion tail. */
  def report(completions: DataFrame): DataFrame = {
    val spark = completions.sparkSession
    val stepLattice = spark.createDataFrame(
      Steps.zipWithIndex.map { case (n, i) => (i + 1L, n) })
      .toDF("step", "step_name")
    val counts = completions.groupBy("step")
      .agg(count(lit(1)).as("present"))
    val rows = stepLattice.join(counts, Seq("step"), "left")
      .select(col("step"), col("step_name"),
        coalesce(col("present"), lit(0L)).as("n_users"))
    graft.operators.Windows.funnelReportOfCounts(rows)
  }
}
