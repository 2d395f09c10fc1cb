package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.fanout` contract: rebalance ONLY in the small-file regime
  * (scan partitions < cores) and be an exact no-op otherwise — the
  * property that makes it safe to leave in production plans, where a
  * large scan already has ≥ cores partitions and an unconditional
  * repartition would add a corpus-sized shuffle. */
class FanoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a 1-partition scan fans out to defaultParallelism; content unchanged") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    assume(docs.queryExecution.toRdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    val fanned = Tables.fanout(docs)
    assert(fanned.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(fanned.count() == docs.count())
    val a = docs.select(sum(col("doc_id"))).first().getLong(0)
    val b = fanned.select(sum(col("doc_id"))).first().getLong(0)
    assert(a == b, "fanout must not change the row multiset")
  }

  test("a wide-enough relation passes through untouched (no extra shuffle)") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val wide = (1L to 100L).toDF("v").repartition(par + 2)
    val out = Tables.fanout(wide)
    assert(out.queryExecution.toRdd.getNumPartitions == par + 2,
      "fanout must be an identity when partitions >= cores")
    // identity means the SAME plan — no Exchange added on top
    assert(out.queryExecution.logical eq wide.queryExecution.logical)
  }
}
