package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X81 — the IVF nprobe tuning curve. Recall must be a LAW of the
  * probe-depth lattice, not just a number: deeper probing scans a
  * superset of cells, so per-query hits can only grow with nprobe, and
  * the curve must actually move on the harness corpus (a flat curve
  * would mean the cells aren't partitioning the neighbors at all).
  */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("recall curve: full lattice, per-query monotone in nprobe, moving") {
    val rows = SparkEntry.queries("ivf_nprobe_recall")(spark, Dir).collect()
    val probes = Seq(1L, 2L, 4L)
    assert(rows.length == 10 * probes.length, "10 queries × 3 probe depths")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).toSeq.sorted == probes, s"query $q probe set")
      val hits = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
        s"query $q: hits must be monotone in nprobe, got ${hits.toSeq}")
      rs.foreach { r =>
        assert(r.getLong(2) >= 0 && r.getLong(2) <= 10)
        assert(r.getLong(3) == r.getLong(2) * 100,
          "recall_permille must be the exact hits/k rational")
      }
    }
    val mean = probes.map(p =>
      rows.filter(_.getLong(1) == p).map(_.getLong(3)).sum / 10)
    assert(mean.head < mean.last,
      s"the curve must move between nprobe=1 and nprobe=4, got $mean")
  }
}
