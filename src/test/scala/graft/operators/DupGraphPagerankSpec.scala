package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The candidate-graph PageRank pinned by an independent Scala power
  * method (built from the registered candidate pairs, which carry their
  * own oracle), plus the structural laws the oracle hash only states
  * implicitly: isolated docs sit exactly at the (1000−d)-floor
  * baseline, every connected doc strictly exceeds it, and the injected
  * near-dup re-crawls make each original/copy pair mutual neighbors so
  * hub structure provably exists. */
class DupGraphPagerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val Scale = 1000000L
  private val Damp = 850L
  private val Baseline = (1000L - Damp) * Scale / 1000L // isolated fixpoint

  test("equals the independent integer power method; floor laws hold") {
    val pairs = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inbound = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val docs = graft.Tables.documents(spark, Dir).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    val nodes = docs ++ docs.map(_ + Dedup.ReKeyA)
    var rank = nodes.map(_ -> Scale).toMap
    (1 to 3).foreach { _ =>
      rank = nodes.map { v =>
        val inflow = inbound.getOrElse(v, Seq.empty)
          .map(u => rank(u) / deg(u)).sum
        v -> (((1000L - Damp) * Scale) + Damp * inflow) / 1000L
      }.toMap
    }
    val want = nodes.sorted.map(v =>
      (v, rank(v), deg.getOrElse(v, 0L)))
    val got = SparkEntry.queries("dup_graph_pagerank")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    assert(got == want, "pagerank diverges from the independent power method")
    // structural laws
    val isolated = got.filter(_._3 == 0L)
    val connected = got.filter(_._3 > 0L)
    assert(connected.nonEmpty,
      "the injected re-crawls must produce candidate edges")
    isolated.foreach { case (v, r, _) =>
      assert(r == Baseline, s"isolated $v must sit at the $Baseline floor, got $r") }
    connected.foreach { case (v, r, _) =>
      assert(r > Baseline, s"connected $v must strictly exceed the floor, got $r") }
  }
}
