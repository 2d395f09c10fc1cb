package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The domain gate must actually partition the harness corpus — a
  * threshold that keeps (or drops) everything tests nothing — and its
  * keep decision must be exactly the integer cross-multiply on the
  * per-source counts the output itself carries. */
class SourceGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("both gate branches fire on the harness corpus, whole sources at a time") {
    val out = SparkEntry.queries("source_quality_gate")(spark, Dir).collect()
    val allSources = graft.Tables.documents(spark, Dir)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val kept = out.map(_.getString(1)).toSet
    assert(kept.nonEmpty, "the gate must keep some sources")
    assert(kept != allSources, "the gate must drop some sources")
    // domain granularity: a kept source keeps ALL its docs
    val perSourceCounts = out.groupBy(_.getString(1)).view.mapValues(_.length)
    perSourceCounts.foreach { case (s, n) =>
      val total = graft.Tables.documents(spark, Dir)
        .filter(org.apache.spark.sql.functions.col("source") === s).count()
      assert(n == total, s"source $s must ship whole: $n of $total docs")
    }
  }

  test("the stats join is AQE-owned: no hint, broadcast still picked at runtime") {
    // a forced broadcast(stats) would OOM the driver at web scale
    // (~10^8 domains); unhinted, AQE broadcasts from observed size here
    // and degrades to a shuffle join there
    val df = SparkEntry.queries("source_quality_gate")(spark, Dir)
    val logical = df.queryExecution.logical.toString
    assert(!logical.toLowerCase.contains("hint"),
      s"domain-stats join must not carry a broadcast hint:\n$logical")
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin"),
      s"AQE should still pick broadcast for the tiny stats side:\n$executed")
  }

  test("the keep decision is the exact 30% cross-multiply on the carried counts") {
    val out = SparkEntry.queries("source_quality_gate")(spark, Dir).collect()
    out.foreach { r =>
      val (docs, short) = (r.getLong(3), r.getLong(4))
      assert(short * 10 <= docs * 3,
        s"row ${r.getLong(0)}: carried counts violate the gate law ($short/$docs)")
    }
  }
}
