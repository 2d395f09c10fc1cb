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

  test("source_token_budget: kept docs are a priority-order prefix that " +
    "spends exactly under each source's budget, and both branches fire") {
    val rows = SparkEntry.queries("source_token_budget")(spark, Dir)
      .select("doc_id", "source", "n_tok", "budget", "spent_before", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val inOrder = docs.sortBy(d => (-d._3, d._1)) // n_tok desc, doc_id
      val budget = docs.head._4
      assert(docs.forall(_._4 == budget), s"$src: budget must be per-source constant")
      // spent_before is the exact running sum of the priority order
      inOrder.zip(inOrder.scanLeft(0L)(_ + _._3)).foreach { case (d, expect) =>
        assert(d._5 == expect, s"$src doc ${d._1}: spent_before ${d._5} != $expect")
        assert(d._6 == (d._5 < budget), s"$src doc ${d._1}: keep flag diverges")
      }
      // the kept set is a PREFIX of the order (never a gap), and the
      // highest-priority doc survives whenever the source has any
      // budget at all (a mass-1 source floors to budget 0 and keeps
      // nothing — the documented boundary)
      val keeps = inOrder.map(_._6)
      if (budget > 0)
        assert(keeps.head, s"$src: first doc in priority order must be kept")
      assert(!keeps.dropWhile(identity).contains(true), s"$src: kept set has a gap")
    }
    // the 6/10 budget must actually bite somewhere and spare somewhere
    assert(rows.exists(_._6) && rows.exists(!_._6))
  }
}
