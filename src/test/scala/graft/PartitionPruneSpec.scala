package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SimpleMode

/** Write-path partition pruning: the other half of the storage-layout
  * story next to BucketingSpec (co-located joins) and `zorder_layout`
  * (intra-file clustering). A corpus written `partitionBy(lang)` must
  * answer a single-language query by scanning ONLY that language's
  * directory — the partition filter resolves at planning time from
  * directory names, before any file I/O.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lang-partitioned write → single-partition scan with PartitionFilters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    try {
      Tables.documents(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      val en = spark.read.parquet(dir).filter(col("lang") === "en")
      val plan = en.queryExecution.explainString(SimpleMode)
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"expected a lang partition filter at the scan:\n$plan")
      // the pruned scan must read fewer files than the full table scan
      val prunedFiles = en.select(input_file_name()).distinct().count()
      val allFiles = spark.read.parquet(dir)
        .select(input_file_name()).distinct().count()
      assert(prunedFiles < allFiles,
        s"pruning read $prunedFiles of $allFiles files — nothing pruned")
      // and every file it did read lives under the en partition directory
      val paths = en.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(paths.nonEmpty && paths.forall(_.contains("lang=en")), paths.mkString(", "))
      // correctness: pruned read returns exactly the en rows
      val expected = Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(col("lang") === "en").count()
      assert(en.count() === expected)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
