package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The rate report must be exactly the per-source rollup of the
  * registered cluster labels (brute-force composed from
  * near_dup_cluster's own output and the synthetic-band source
  * attribution), with the counting identities and the planted
  * near-dup structure visible in the rates. */
class DedupRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("report equals the per-source rollup of near_dup_cluster's labels") {
    val labels = SparkEntry.queries("near_dup_cluster")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = spark.read.parquet(s"$Dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = labels
      .groupBy { case (id, _) =>
        srcOf(if (id >= Dedup.ReKeyA) id - Dedup.ReKeyA else id)
      }
      .map { case (src, ds) =>
        val kept = ds.count { case (id, cid) => id == cid }.toLong
        val n = ds.length.toLong
        src -> (n, kept, n - kept, (n - kept) * 1000L / n)
      }
    val got = SparkEntry.queries("dedup_rate_report")(spark, Dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    assert(got == expected,
      s"rate report diverges from the label rollup:\n got $got\n exp $expected")
  }

  test("counting identities hold and the planted near-dup structure shows") {
    val rows = SparkEntry.queries("dedup_rate_report")(spark, Dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kept, dropped, pm) =>
      assert(kept + dropped == n, s"$src: kept+dropped != docs")
      assert(pm == dropped * 1000L / n, s"$src: drop_permille not the exact ratio")
      assert(kept >= 1, s"$src: a source must keep at least one canonical")
    }
    // the corpus doubles every doc with an injected near-dup variant,
    // so drops must be substantial overall — at least a quarter of the
    // doubled corpus clusters away (the planted positive path)
    val total = rows.map(_._2).sum
    val droppedTotal = rows.map(_._4).sum
    assert(droppedTotal * 4 >= total,
      s"planted near-dups should drop >= 25% of the doubled corpus: $droppedTotal of $total")
  }
}
