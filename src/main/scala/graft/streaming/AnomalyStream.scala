package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event entering the volume tracker. */
final case class VolObs(eventType: String, ts: Timestamp)

/** A keyed-CDC event for the replay-gated tracker: `(ts, eventId)` is
  * the per-type delivery order the gate advances along. */
final case class VolEvent(eventType: String, ts: Timestamp, eventId: Long)

/** One per-batch daily-count increment: adding `dn` to the
  * (eventType, day) cell. Summing all emitted deltas reconstructs the
  * batch daily histogram exactly. */
final case class DailyDelta(eventType: String, day: Timestamp, dn: Long)

/** Streaming twin of the batch `anomaly_mad` (X120) — continuous
  * daily-volume monitoring: the stream maintains the (event_type, day)
  * COUNT HISTOGRAM as its aggregation state (complete mode; counts are
  * a commutative monoid, so any micro-batch split converges exactly),
  * and the MAD medians + 3-MAD verdicts are read from the histogram
  * with the BATCH query's own extraction (`Windows.madOfDaily`) —
  * parity by shared code, the QuantileStream discipline. The verdict
  * for PAST days sharpens as the median window grows, which is the
  * correct monitoring semantics (a flag is relative to the baseline
  * known so far).
  *
  * Delivery: [[daily]] is the exactly-once-source spelling;
  * at-least-once REDELIVERY would double-count it. For an
  * at-least-once keyed CDC source, [[trackedDeltas]] is the
  * replay-gated spelling under [[Scd2Stream]]'s ordered-delivery
  * contract: per event_type the tracker advances a (ts, event_id)
  * watermark, skips anything at or before it as an idempotent replay,
  * and emits per-batch daily-count DELTAS — a monoid, so the
  * downstream rollup reconstructs the exact daily histogram under
  * arbitrary prefix redelivery ([[AnomalyStreamSpec]] proves
  * replay ≡ batch).
  *
  * Scale shape: complete-mode state rows ≤ types × days
  * (calendar-bounded — the batch op's own histogram bound);
  * tracked-gate state is ONE watermark tuple per event_type; map-side
  * combinable per batch.
  */
object AnomalyStream {

  /** The streaming daily histogram — the state the tracker keeps. */
  def daily(obs: Dataset[VolObs]): DataFrame =
    obs.toDF("event_type", "ts")
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  /** MAD flags from a materialized histogram — the batch extraction. */
  def flags(daily: DataFrame): DataFrame =
    graft.operators.Windows.madOfDaily(daily)

  private def micros(ts: Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  /** UTC day start of `ts` — the JVM spelling of the batch
    * `date_trunc('DAY', ts)` under the session time zone Sessions.scala
    * pins to UTC. Pinned to UTC explicitly (the RetentionStream
    * lesson): Timestamp.toLocalDateTime would read the JVM DEFAULT
    * zone and shift near-midnight events into the wrong day on a
    * non-UTC host. */
  private def dayStartUtc(ts: Timestamp): Timestamp =
    Timestamp.from(java.time.LocalDate
      .ofInstant(ts.toInstant, java.time.ZoneOffset.UTC)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant)

  /** (lastTsMicros, lastId) per event_type — the replay watermark. */
  private type St = (Long, Long)

  /** Replay-gated daily-count deltas for an at-least-once ORDERED
    * keyed CDC source — see the delivery contract above. */
  def trackedDeltas(events: Dataset[VolEvent]): Dataset[DailyDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.eventType)
      .flatMapGroupsWithState[St, DailyDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (etype, incoming, state: GroupState[St]) =>
          var (lastTs, lastId) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue))
          val delta = scala.collection.mutable.Map.empty[Timestamp, Long]
          incoming.toSeq.sortBy(e => (micros(e.ts), e.eventId)).foreach { e =>
            val t = micros(e.ts)
            // replay gate: at-or-before the watermark = already counted
            if (t > lastTs || (t == lastTs && e.eventId > lastId)) {
              val d = dayStartUtc(e.ts)
              delta(d) = delta.getOrElse(d, 0L) + 1L
              lastTs = t; lastId = e.eventId
            }
          }
          state.update((lastTs, lastId))
          delta.iterator.map { case (d, dn) => DailyDelta(etype, d, dn) }
      }
  }
}
