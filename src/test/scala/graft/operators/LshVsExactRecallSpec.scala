package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** lsh_vs_exact_recall must be the set algebra of its two inputs: the
  * X131 exact truth and the X2 LSH candidate relation. */
class LshVsExactRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("report equals the driver-side set algebra of truth and candidates") {
    val Seq(r) = SparkEntry.queries("lsh_vs_exact_recall")(spark, Dir).collect().toSeq
    val (nT, nC, nH, rec, prec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val truth = SparkEntry.queries("jaccard_prefix_join")(spark, Dir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val cands = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nT == truth.size && nC == cands.size)
    assert(nH == (truth intersect cands).size)
    assert(rec == (if (nT == 0) 1000L else nH * 1000 / nT))
    assert(prec == (if (nC == 0) 1000L else nH * 1000 / nC))
    assert(nH <= math.min(nT, nC))
    // the near-dup corpus must make the audit non-degenerate
    assert(nT > 0 && rec > 500, s"LSH recall $rec against $nT truth pairs")
  }
}
