package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Scale-contract tests for the ANN family: the IVF centroid side must
  * be a FIXED-cardinality sample — K independent of corpus size — so the
  * assignment stage is O(N·K) and `broadcast(cent)` stays bounded. A
  * constant stride (r2's defect) makes K ∝ N and assignment quadratic. */
class SimilarityScaleSpec extends AnyFunSuite {

  test("ivfStride caps the centroid count at IvfK for ANY corpus size") {
    // ids are dense 0..n-1; centroids are ids divisible by the stride
    val sizes = Seq(1L, 2L, 15L, 16L, 17L, 100L, 999L, 1000L, 12345L,
      1000000L, 123456789L, 100000000000L)
    sizes.foreach { n =>
      val stride = Similarity.ivfStride(n)
      val centroids = (n - 1) / stride + 1 // count of multiples of stride in [0, n)
      assert(centroids <= Similarity.IvfK,
        s"n=$n stride=$stride gives $centroids centroids > K=${Similarity.IvfK}")
      assert(centroids >= math.min(n, Similarity.IvfK / 2L),
        s"n=$n stride=$stride gives only $centroids centroids — sample too sparse")
    }
  }

  test("the actual centroid relation at sf0.001 is bounded by IvfK") {
    val spark = TestSpark.spark
    val e = Tables.embeddingsD(spark, "/root/testdata/sf0.001")
    val n = e.count()
    val stride = Similarity.ivfStride(n)
    val k = e.filter(org.apache.spark.sql.functions.col("vec_id") % stride === 0).count()
    assert(k > 0 && k <= Similarity.IvfK, s"centroid sample has $k rows (K=${Similarity.IvfK})")
  }
}
