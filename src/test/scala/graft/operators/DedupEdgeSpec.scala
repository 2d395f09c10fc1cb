package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degenerate inputs for the CC core. The sum-based convergence check
  * compares exact decimal label sums between rounds; `sum()` over zero
  * rows is NULL, so the empty corpus is the one input where the sum is
  * not a number — it must coalesce to 0 and converge immediately, not
  * NPE in `compareTo`.
  */
class DedupEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clusterLabelsOf on an empty relation returns empty without NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.clusterLabelsOf(empty)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(out.count() == 0)
  }

  test("exact_substr packing fails LOUDLY past the 2^21 token-position bound") {
    import spark.implicits._
    // 2^21 + 16 tokens: positions past the packing bound must raise,
    // not silently fold into a neighboring doc's key space
    val n = (1 << 21) + 16
    val big = Seq((7L, Array.tabulate(n)(i => "t" + (i % 64)).mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.substrSpansOf(big).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("2^21")),
      s"expected the packed-pos guard, got: ${e.getMessage}")
  }

  test("clusterLabelsOf on a single doc labels it with itself") {
    import spark.implicits._
    val one = Seq((42L, "just one document about spark shuffles")).toDF("doc_id", "text")
    val out = Dedup.clusterLabelsOf(one).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((42L, 42L)))
  }
}
