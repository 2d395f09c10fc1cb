package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11 `rest_callout_sink` — the identity-API callout
  * (firebase.py:26-36 `set_custom_user_claims`, api/auth.py:23-65):
  * each changed-claims row becomes one POST of
  * `{"localId": uid, "customAttributes": "<claims json>"}`.
  *
  * Spark shape: `foreachPartition` — the executor-local consumer the
  * engine offers for per-row side effects. Rows stream through the
  * iterator (never collected to the driver); one transport per
  * partition models one HTTP connection per task, matching the
  * reference's single shared `httpx.AsyncClient`. The POST is
  * idempotent (absolute claims per uid, not a delta), so Spark's
  * at-least-once batch replay yields exactly-once effects — the same
  * argument as the merge sinks.
  *
  * The transport is injected: the real one would be an HTTP POST with a
  * bearer token (auth-token caching per partition, firebase.py:12-18);
  * the environment has no network, so tests inject a recording fake.
  * Failures are COUNTED per batch (not thrown per row): the reference's
  * poll loop logs-and-continues (tasks.py:23-37), and the returned
  * count lets `foreachBatch` callers decide to rethrow for batch retry.
  */
object RestSink {
  /** (url, jsonBody) => HTTP status. Must be serializable — it ships to
    * executors. */
  type Transport = (String, String) => Int

  private[streaming] def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** POST one claims update per row of `claims` (the
    * [[UserPipeline.changedClaims]] output: userId, new_claims).
    * Returns the number of failed callouts. */
  def postClaims(claims: DataFrame, url: String, transport: Transport): Long = {
    val failures = claims.sparkSession.sparkContext.longAccumulator("rest_callout_failures")
    claims.select(col("userId").cast("long"), col("new_claims"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val body = s"""{"localId":"${r.getLong(0)}","customAttributes":"${jsonEscape(r.getString(1))}"}"""
          val status =
            try transport(url, body)
            catch { case _: Exception => 599 }
          if (status >= 400) failures.add(1)
        }
      }
    failures.value
  }
}
