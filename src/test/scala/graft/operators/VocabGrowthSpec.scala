package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X87 — the Heaps'-law vocabulary growth curve. The whole report is
  * re-derived brute-force in the driver over raw STRING types (the
  * engine ships h60 ints through its shuffle — an independent path, so
  * a hash or lattice bug diverges), and the curve's two structural laws
  * are pinned: vocab_types is non-decreasing in the prefix, and the
  * growth ratio falls toward 1000 (the synthetic word list saturates —
  * a rising tail would mean the lattice boundaries are wrong).
  */
class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("curve equals a string-typed brute-force recount and saturates") {
    val docs = graft.Tables.documents(spark, Dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.map(_._1).max + 1
    val expected = Seq(10L, 20L, 50L, 100L, 200L, 500L, 1000L).map { p =>
      val cutoff = n * p / 1000
      val types = docs.filter(_._1 < cutoff).flatMap(_._2).toSet.size.toLong
      (p, cutoff, types)
    }
    val withGrowth = expected.zip(None +: expected.map(Some(_))).map {
      case ((p, c, v), prev) =>
        (p, c, v, prev.map(pr => v * 1000 / pr._3).getOrElse(1000L))
    }
    val got = SparkEntry.queries("vocab_growth_curve")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == withGrowth, s"got $got\nexp $withGrowth")
    assert(got.map(_._3) == got.map(_._3).sorted,
      "vocab_types must be non-decreasing in the prefix")
    assert(got.last._4 < got(1)._4,
      "growth must fall toward 1000 as the synthetic vocabulary saturates")
  }
}
