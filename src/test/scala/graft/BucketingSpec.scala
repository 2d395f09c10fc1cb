package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located fact join (docs/SCALE.md "Partitioning & shuffle"):
  * writing both fact tables bucketed on the join key lets every later
  * orderkey join run with ZERO exchanges — the bucketing IS the
  * shuffle, paid once at write time and amortized over every downstream
  * join. This is the 100 TB play for the lineitem⋈orders axis that
  * `fact_join_agg` otherwise re-shuffles per query; asserted here on
  * the physical plan so the claim is checked, not narrated.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("bucketed fact tables join with no Exchange (shuffle paid once at write)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force the shuffle-requiring strategy so the assertion is about
      // exchanges, not about the small-SF broadcast shortcut
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, Dir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/lineitem_b").saveAsTable("lineitem_b")
      Tables.orders(spark, Dir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/orders_b").saveAsTable("orders_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinPart = plan.split("HashAggregate").last // below the final agg
      assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"),
        s"expected a shuffle-class join strategy:\n$plan")
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must not re-shuffle either side:\n$plan")

      // and the result matches the plain (exchange-paying) join
      val expected = Tables.lineitem(spark, Dir)
        .join(Tables.orders(spark, Dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
