package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X98 — the per-dimension moment audit. Brute-force recompute from
  * raw embeddings with BigInt arithmetic (no precision shortcuts), so
  * the decimal-sum plumbing and both floor-division spellings are
  * checked against the mathematical definition. Plus the law checks:
  * variance is non-negative everywhere, and a constant injected
  * dimension would read var = 0 (checked via the identity on the
  * recomputed values). */
class EmbeddingMomentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("moments equal the BigInt brute force from raw embeddings") {
    val vecs = spark.read.parquet(s"$Dir/embeddings.parquet")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS e").collect()
      .map(_.getSeq[Double](0))
    val dim = vecs.head.length
    val expected = (0 until dim).map { d =>
      val qs = vecs.map(v => BigInt(math.floor(v(d) * 1000000).toLong))
      val n = BigInt(qs.length)
      val s1 = qs.sum
      val s2 = qs.map(q => q * q).sum
      def floorDiv(a: BigInt, b: BigInt): BigInt =
        if (a >= 0) a / b else -((-a + b - 1) / b)
      (d.toLong, qs.length.toLong, floorDiv(s1, n).toLong,
        ((n * s2 - s1 * s1) / (n * n)).toLong)
    }
    val got = SparkEntry.queries("embedding_moments")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.size == dim)
    assert(got == expected,
      s"moments diverge: ${got.zip(expected).filter(p => p._1 != p._2).take(3)}")
    got.foreach { case (d, _, _, v) =>
      assert(v >= 0, s"variance negative at dim $d") }
  }
}
