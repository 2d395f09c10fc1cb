package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X99 — the Zipf budget table. Brute-force recompute from raw
  * documents: full type counts, sort by frequency, take exactly
  * vocab_size types (partial count-classes included), sum their
  * counts. Tie-order independence is the operator's own argument —
  * the brute force takes ties in an ARBITRARY order and must still
  * match, because every tied type contributes the same count. Law
  * checks: the curve is monotone in p, ends at exactly 1000‰, and
  * covered_tokens never exceeds the corpus. */
class VocabParetoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val Lattice = Seq(10L, 20L, 50L, 100L, 200L, 500L, 1000L)

  test("curve equals the sorted-frequency brute force, ties in any order") {
    val counts = spark.read.parquet(s"$Dir/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS term").collect()
      .map(_.getString(0))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val sorted = counts.sortBy(-_) // arbitrary within equal counts
    val tTypes = sorted.length.toLong
    val tTokens = sorted.sum
    val expected = Lattice.map { p =>
      val k = math.max(tTypes * p / 1000, 1L)
      val covered = sorted.take(k.toInt).sum
      (p, k, covered, covered * 1000 / tTokens)
    }
    val got = SparkEntry.queries("vocab_pareto_curve")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"curve diverges:\n got $got\n exp $expected")
  }

  test("the curve is a monotone Zipf share ending at exactly 1000 permille") {
    val got = SparkEntry.queries("vocab_pareto_curve")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == Lattice.length)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4,
        s"curve not monotone between $a and $b")
    }
    val last = got.last
    assert(last._4 == 1000L, s"full vocab must cover everything: $last")
    got.foreach { case (p, k, cov, pm) =>
      assert(k >= 1 && cov <= last._3, s"($p): bounds broke")
      assert(pm == cov * 1000 / last._3, s"($p): permille law broke")
    }
  }
}
