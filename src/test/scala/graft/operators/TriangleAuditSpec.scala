package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Brute-force JVM oracle for dup_triangle_audit: recompute the
  * triangle census from the registered candidate relation itself
  * (adjacency sets in plain Scala), plus the planted-structure
  * reading — injected original↔copy pairs alone cannot close
  * triangles, so any triangle requires a genuinely clustered
  * neighborhood. */
class TriangleAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("audit equals the brute-force census over the candidate graph") {
    val edges = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges.map { case (a, b) => a -> b } ++
      edges.map { case (a, b) => b -> a })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.map { case (v, ns) =>
      val deg = ns.size.toLong
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }.toLong
      val cc = if (deg < 2) 0L else (2 * tri * 1000) / (deg * (deg - 1))
      (v, deg, tri, cc)
    }.toSet
    val got = SparkEntry.queries("dup_triangle_audit")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"census diverges: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    assert(got.nonEmpty && got.map(_._2).max >= 2,
      "degenerate graph: no node with degree >= 2")
  }
}
