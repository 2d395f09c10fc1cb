package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** An event entering the volume tracker. */
final case class VolObs(eventType: String, ts: Timestamp)

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
  * Scale shape: state rows ≤ types × days (calendar-bounded — the
  * batch op's own histogram bound); map-side combinable per batch.
  * Like [[QuantileStream]], redelivery would double-count — the
  * tracker sits behind an exactly-once source, documented.
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
}
