package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A value observation entering the quantile tracker. */
final case class QObs(eventType: String, value: Double)

/** Streaming twin of the batch `histogram_quantiles` (X134) — the
  * monitoring-system quantile path run as a continuous query: the
  * stream maintains the (event_type, cents) COUNT HISTOGRAM as its
  * aggregation state (complete-mode output), and quantiles are read
  * from the histogram table with the BATCH query's own extraction
  * code (`Olap.quantilesOfHist`) — parity by shared code, the
  * DsirStream/PqStream discipline.
  *
  * Why this state is sound where a per-type sorted-list tracker is
  * not: the histogram is bounded by the VALUE DOMAIN (cents), not the
  * stream length — the same argument as the batch op — and counts are
  * a commutative monoid, so any micro-batch split converges to the
  * batch histogram exactly. At-least-once REDELIVERY, unlike the
  * CRDT trackers (min/max/union), would double-count — the tracker
  * sits behind an exactly-once source (the Structured Streaming
  * default with replayable sources + idempotent sinks), documented
  * rather than silently wrong.
  *
  * Scale shape: state rows ≤ types × cents-domain; updates map-side
  * combinable within every micro-batch.
  */
object QuantileStream {

  /** The streaming histogram aggregate — the state the tracker keeps. */
  def histogram(obs: Dataset[QObs]): DataFrame =
    obs.toDF("event_type", "value")
      .withColumn("cents", expr("CAST(floor(value * 100) AS BIGINT)"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("c"))

  /** Quantiles from a materialized histogram table — the batch
    * query's own extraction, re-exported for sink-side reads. */
  def quantiles(hist: DataFrame): DataFrame =
    graft.operators.Olap.quantilesOfHist(hist)
}
