package graft.operators

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
import org.apache.spark.sql.execution.{LogicalRDD, RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The composed corpus_pipeline must stay ONE fused DAG with the
  * shared-label dedup shape — these assertions are on the optimized
  * logical plan (collected node types, not explain-string matching,
  * which under AQE reprints cached subtrees and miscounts). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private lazy val df = SparkEntry.queries("corpus_pipeline")(spark, Dir)
  private lazy val plan = df.queryExecution.optimizedPlan

  // The persisted stage outputs bury upstream subtrees inside
  // InMemoryRelation cached PHYSICAL plans, which plan.collect does not
  // enter — recurse through cache and AQE boundaries to see everything.
  private def physNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    here ++ here.flatMap {
      case a: AdaptiveSparkPlanExec  => physNodes(a.inputPlan)
      case s: InMemoryTableScanExec  => physNodes(s.relation.cachedPlan)
      case _                         => Nil
    }
  }
  private lazy val nested: Seq[SparkPlan] =
    plan.collect { case m: InMemoryRelation => m }.flatMap(m => physNodes(m.cachedPlan))

  test("cluster labels are computed exactly once (one checkpointed relation)") {
    // DataFrame reuse duplicates logical SUBTREES, so the label relation
    // appears many times — what must be unique is the underlying RDD:
    // one checkpointed label computation, every consumer re-reading its
    // blocks (never re-running the CC loop).
    val rddIds = plan.collect { case l: LogicalRDD => l.rdd.id } ++
      nested.collect { case r: RDDScanExec => r.rdd.id }
    assert(rddIds.nonEmpty, "expected the checkpointed label relation in the plan")
    assert(rddIds.distinct.size == 1,
      s"expected exactly 1 distinct label RDD (labels computed once); got ids ${rddIds.distinct}")
  }

  test("no stage re-scans the source table: downstream reads the stage caches") {
    val parquetScans = plan.collect { case l: LogicalRelation => l }
    assert(parquetScans.isEmpty,
      s"every post-dedup stage must read the persisted survivor relation, " +
        s"not re-scan parquet; found ${parquetScans.size} scans")
    // Exactly the four multi-consumer stage outputs are cached: the
    // stage-1 survivors, the resolve output, the chunk-dedup segment
    // relation (r15 — feeds the df aggregate and the flag join inside
    // Dedup.chunkDedupOf), and the quality/PII output (read by the
    // resample count + join). Only the outermost cache shows in the
    // logical plan; the upstream ones sit nested inside its cached
    // physical plan.
    val cacheIds =
      plan.collect { case m: InMemoryRelation => m.cacheBuilder.cachedPlan.id } ++
      nested.collect { case s: InMemoryTableScanExec => s.relation.cacheBuilder.cachedPlan.id }
    assert(cacheIds.distinct.size == 4,
      s"expected the 4 persisted stage outputs; got ${cacheIds.distinct.size}")
  }

  test("the only window is the bounded per-shard prefix sum") {
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.size == 1, s"expected 1 window (sequence packing); got ${windows.size}")
    assert(windows.head.partitionSpec.nonEmpty,
      "the packing window must be sharded, never a global prefix sum")
  }

  test("no cartesian growth: the only cross join is the one-row n_min broadcast") {
    val crosses = plan.collect { case j: Join if j.joinType == Cross => j }
    assert(crosses.size <= 1, s"expected at most the one-row n_min cross; got ${crosses.size}")
  }

  test("exact re-crawl copies never survive the pipeline") {
    val ids = df.select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    assert(!ids.exists(id => id >= Dedup.ReKeyA && id < Dedup.ReKeyB),
      "stage 1 must remove every exact re-crawl (+ReKeyA ids)")
  }

  test("PII audit trail: injected positives are counted and scrubbed") {
    val rows = df.filter("doc_id % 10 = 0 and n_emails = 0").count()
    assert(rows == 0, "every injected contact line must be counted by the redaction stage")
  }
}
