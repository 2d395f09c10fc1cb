package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X84 — PMI-ranked collocation mining. The whole report is re-derived
  * by a driver-side brute-force count over the same corpus (bigram +
  * unigram tallies, cohesion, (cohesion desc, gram) ordering) and must
  * match row for row — ranking, ties, and the integer cohesion
  * identity included.
  */
class CollocationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("top-16 equals a brute-force recount (ordering, ties, identity)") {
    val texts = graft.Tables.documents(spark, Dir)
      .select("text").collect().map(_.getString(0))
    val uni = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      ws.foreach(w => uni(w) += 1)
      ws.sliding(2).filter(_.length == 2).foreach(p => big((p(0), p(1))) += 1)
    }
    val brute = big.toSeq
      .filter(_._2 >= 5)
      .map { case ((a, b), nab) =>
        (a, b, nab, uni(a), uni(b), nab * 1000000000L / (uni(a) * uni(b)))
      }
      .sortBy { case (a, b, _, _, _, c) => (-c, s"$a $b") }
      .take(16)

    val got = SparkEntry.queries("collocation_lift")(spark, Dir).collect()
    assert(got.length == 16)
    got.zip(brute).zipWithIndex.foreach { case ((r, e), i) =>
      assert(r.getLong(0) == i + 1, "dense rank contract")
      assert((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) == e, s"rank ${i + 1} mismatch")
    }
    assert(got.map(_.getLong(6)).sliding(2).forall(p => p.head >= p.last),
      "cohesion non-increasing in rank")
  }
}
