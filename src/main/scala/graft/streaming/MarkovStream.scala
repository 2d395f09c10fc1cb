package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event entering the transition tracker. */
final case class MkvEvent(userId: Long, ts: Timestamp, eventId: Long,
  eventType: String)

/** One observed (prev → next) transition. */
final case class Transition(prevType: String, nextType: String)

/** Streaming twin of the batch `markov_transitions` (X126) — the
  * transition stream extracted continuously at ingest: per-user state
  * is ONE tuple (last event's ts/id/type); each in-order arrival emits
  * its (prev, next) edge and advances the state. The transition MATRIX
  * is then a plain count over the emitted edges — monoid, so any
  * downstream consumer (a second streaming agg, a batch rollup) gets
  * the batch matrix exactly.
  *
  * Delivery contract: [[Scd2Stream]]'s — consecutive-pair extraction
  * is order-sensitive, so the tracker requires PER-KEY ordered
  * delivery (the keyed-CDC-log guarantee) and skips anything at or
  * before its (ts, event_id) watermark as an idempotent replay;
  * at-least-once prefix redelivery converges bit-identically
  * ([[MarkovStreamSpec]]).
  *
  * Scale shape: O(users) state, one small tuple each; lifetime
  * emission = transitions (events − users). */
object MarkovStream {

  private def micros(ts: Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  /** (lastTsMicros, lastId, lastType). */
  private type St = (Long, Long, String)

  def transitions(events: Dataset[MkvEvent]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[St, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, incoming, state: GroupState[St]) =>
          var (lastTs, lastId, lastType) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, null: String))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          incoming.toSeq.sortBy(e => (micros(e.ts), e.eventId)).foreach { e =>
            val t = micros(e.ts)
            if (t > lastTs || (t == lastTs && e.eventId > lastId)) {
              if (lastType != null) out += Transition(lastType, e.eventType)
              lastTs = t; lastId = e.eventId; lastType = e.eventType
            }
          }
          state.update((lastTs, lastId, lastType))
          out.iterator
      }
  }
}
