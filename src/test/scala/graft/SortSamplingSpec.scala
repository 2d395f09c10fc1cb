package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine finding (r16), pinned as a regression tripwire: a GLOBAL
  * `orderBy` is a range exchange, and `RangePartitioner`'s boundary
  * sampling executes the ENTIRE child sub-plan once before the real
  * pass runs it again — a reservoir sample per partition still reads
  * every row, so every projection below the sort is evaluated 2N
  * times. Cheap column picks don't care; a heavy scalar kernel
  * (JSON parse, regexp, a native hash kernel) below a corpus-sized
  * global sort pays double.
  *
  * Measured consequence: `cast_str_int`'s `get_json_object` parsed
  * 100k rows twice on ONE task (2 MB single-partition scan) — the
  * r16 fanout fix parallelizes both passes but the double evaluation
  * is structural. The design rule this spec documents: put heavy
  * per-row work ABOVE the final sort when output order permits, or
  * accept the 2× knowingly (every registered query's final orderBy is
  * over aggregate-sized or already-cheap relations — checked by the
  * plan audits in docs/SCALE.md).
  *
  * Proof mechanism: `observe` counts evaluated rows per execution —
  * the CollectMetrics accumulator sits below/above the sort and the
  * sampling job's tasks update it like any other. */
class SortSamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def observedRows(build: => org.apache.spark.sql.DataFrame): Long = {
    var got = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.get("probe").foreach(r => got = r.getLong(0))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      build.write.format("noop").mode("overwrite").save()
      org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    got
  }

  test("range-sort sampling re-evaluates the sub-plan below it, and only it") {
    val n = Tables.events(spark, Dir).count()
    assert(n > 0)
    val below = observedRows(
      Tables.events(spark, Dir)
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .observe("probe", count(lit(1)).as("rows"))
        .orderBy("event_id"))
    val above = observedRows(
      Tables.events(spark, Dir)
        .select(col("event_id"), col("props"))
        .orderBy("event_id")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .observe("probe", count(lit(1)).as("rows")))
    assert(above == n,
      s"projection above the sort should evaluate once per row: $above vs $n")
    assert(below == 2 * n,
      s"expected the boundary-sampling double evaluation below the sort " +
        s"($below vs 2x$n) — if this now equals $n, Spark stopped " +
        "re-executing the child for range boundaries and the design rule " +
        "in this spec's scaladoc (and docs/SCALE.md r16) should be retired")
  }
}
