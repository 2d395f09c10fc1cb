package graft.operators

import org.apache.spark.sql.catalyst.plans.FullOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LWindow}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The recrawl delta pipeline must price O(|delta|), not O(|corpus|):
  * the snapshot diff is the only corpus-sized step — persisted once,
  * consumed by both output branches — and everything after it is a
  * row-local projection/filter over the changed+added docs. The plan
  * makes that checkable: scans, joins, windows and aggregates are
  * counted on the optimized plan, recursing through the cache boundary
  * the way PipelineSpec does. */
class IncrementalPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private lazy val df = SparkEntry.queries("incremental_pipeline")(spark, Dir)
  private lazy val plan = df.queryExecution.optimizedPlan

  private def physNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    here ++ here.flatMap {
      case a: AdaptiveSparkPlanExec => physNodes(a.inputPlan)
      case s: InMemoryTableScanExec => physNodes(s.relation.cachedPlan)
      case _                        => Nil
    }
  }
  // The persisted diff appears in BOTH union branches (processed ∪ retired);
  // count its physical nodes once per distinct cache, not per occurrence.
  private lazy val nested: Seq[SparkPlan] =
    plan.collect { case m: InMemoryRelation => m }
      .groupBy(_.cacheBuilder.cachedPlan.id).values.map(_.head).toSeq
      .flatMap(m => physNodes(m.cachedPlan))

  test("the corpus is scanned exactly once per snapshot side, inside the diff stage") {
    assert(plan.collect { case l: LogicalRelation => l }.isEmpty,
      "both output branches must read the persisted diff, never parquet")
    val caches = plan.collect { case m: InMemoryRelation => m.cacheBuilder.cachedPlan.id }
    assert(caches.distinct.size == 1, s"expected the one persisted diff; got $caches")
    val scans = nested.collect { case f: FileSourceScanExec => f }
    assert(scans.size == 2,
      s"expected 2 parquet scans (old + new snapshot) inside the diff; got ${scans.size}")
  }

  test("the diff full-outer join is the only join; delta stages are row-local") {
    assert(plan.collect { case j: Join => j }.isEmpty,
      "no join may run over the delta")
    val joins = nested.collect { case j: BaseJoinExec => j }
    assert(joins.size == 1 && joins.head.joinType == FullOuter,
      s"expected exactly the one full-outer diff join; got ${joins.map(_.joinType)}")
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "no window may run over the delta")
    assert(plan.collect { case a: Aggregate => a }.isEmpty,
      "no aggregate may run over the delta")
  }

  test("statuses partition the delta: retirements match the snapshot diff") {
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "one row per doc_id")
    val retired = rows.filter(_.getString(1) == "retired").map(_.getLong(0)).toSet
    val removedByDiff = SparkEntry.queries("snapshot_diff")(spark, Dir)
      .filter("status = 'removed'").collect().map(_.getLong(0)).toSet
    assert(retired == removedByDiff,
      "retired set must equal the snapshot_diff removed set")
    // retired rows carry zeroed audit counts
    rows.filter(_.getString(1) == "retired").foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    }
  }

  test("the repetition gate drops every junk-injected delta doc") {
    val ids = df.collect().map(_.getLong(0)).toSet
    val junkChanged = graft.Tables.documents(spark, Dir)
      .filter("doc_id % 40 = 4 AND doc_id % 7 <> 0")
      .collect().map(_.getLong(0))
    assert(junkChanged.nonEmpty, "the injection rule must hit the corpus")
    junkChanged.foreach(id =>
      assert(!ids.contains(id), s"junk doc $id must be filtered out"))
  }

  test("PII audit: every surviving doc_id % 4 == 0 delta doc counts its positive") {
    val bad = df.filter(
      "status IN ('added','changed') AND doc_id % 4 = 0 AND n_emails = 0").count()
    assert(bad == 0, "every injected contact line must be counted")
  }
}
