package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X144 law spec: the sort-free two-phase index is a VALID PERMUTATION
  * (exactly 0..N−1 — equality to the oracle's naive global sort is the
  * DuckDB gate's job), it is deterministic across partitionings, and
  * it actually shuffles: ingest order decorrelates and sources
  * interleave in every span. */
class GlobalShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def rows: Seq[(Long, String, Long)] =
    SparkEntry.queries("global_shuffle_order")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("shuffle_idx is a permutation of 0..N-1, stable across runs") {
    val a = rows
    assert(a.map(_._3).sorted == a.indices.map(_.toLong))
    assert(rows == a) // content-keyed: re-planning cannot change it
  }

  test("it shuffles: ingest order decorrelates and sources mix in every decile") {
    val a = rows.sortBy(_._3)
    val n = a.size
    // a true shuffle breaks doc_id monotonicity almost everywhere:
    // count ascending adjacent pairs ~ n/2, never close to n
    val asc = a.sliding(2).count(p => p(1)._1 > p(0)._1)
    assert(asc < n * 6 / 10 && asc > n * 4 / 10, s"suspicious order: $asc/$n ascending")
    // every decile of the shuffled order sees more than one source
    a.grouped(math.max(n / 10, 1)).foreach { span =>
      assert(span.map(_._2).distinct.size > 1, "a decile collapsed to one source")
    }
  }
}
