package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X88 — the Matryoshka truncation-recall audit. The report is
  * re-derived brute-force in the driver (plain Scala doubles, same
  * left-to-right fold as graft_dot, independent ranking path), and the
  * audit's diagnostic laws are pinned: on random testdata truncation
  * must lose ranking quality (mean recall@16 < 1000) and adding
  * dimensions back must on average recover it (mean@32 ≥ mean@16).
  */
class MatryoshkaSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"
  private val K = 10

  test("recall equals the brute-force prefix ranking and orders by dim") {
    val vecs = graft.Tables.embeddings(spark, Dir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def dotN(a: Array[Double], b: Array[Double], n: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def normN(a: Array[Double], n: Int) = math.sqrt(dotN(a, a, n))
    val kept = vecs.filter { case (_, v) => normN(v, 16) > 0 }
    def topIds(qid: Long, q: Array[Double], n: Int): Set[Long] =
      kept.filter(_._1 != qid).map { case (id, v) =>
        (-dotN(q, v, n) / (normN(q, n) * normN(v, n)), id)
      }.sorted.take(K).map(_._2).toSet
    val expected = kept.filter(_._1 < 10).flatMap { case (qid, q) =>
      val ex = topIds(qid, q, 64)
      Seq(16, 32).map { d =>
        val hits = (topIds(qid, q, d) & ex).size.toLong
        (qid, d.toLong, hits, hits * 1000 / K)
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.queries("matryoshka_recall")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"got $got\nexp $expected")

    val by = got.groupBy(_._2).view.mapValues(rs => rs.map(_._4).sum.toDouble / rs.size)
    assert(by(16L) < 1000.0, "16-dim truncation must lose recall on random data")
    assert(by(32L) >= by(16L), "mean recall must be non-decreasing in kept dims")
  }
}
