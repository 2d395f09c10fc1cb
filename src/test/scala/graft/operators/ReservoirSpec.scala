package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The one regression the oracle gate is structurally blind to: the
  * reservoir pre-filter's original `(2^60 div n) * C·k` threshold
  * overflowed BIGINT for groups with n ≤ 9 and ABORTED under ANSI —
  * and the DuckDB twin shared the spelling, so hash-parity stayed
  * green. The cross-multiplied form must return every row of a
  * sub-k group and exactly k of a large one, under ANSI, no abort.
  */
class ReservoirSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("pre-filter survives ANSI on groups smaller than k and returns them whole") {
    val s = spark
    import s.implicits._
    val rows =
      (1L to 3L).map(i => ("tiny", i)) ++        // n=3 ≤ 9: aborted before the fix
        (1L to 9L).map(i => ("edge", i + 10)) ++ // n=9: the largest aborting size
        (1L to 500L).map(i => ("big", i + 100))
    val out = Curation.reservoirCore(rows.toDF("source", "doc_id")).collect()
    val bySrc = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySrc("tiny") === 3, "sub-k group must be returned in full")
    assert(bySrc("edge") === 9, "n=9 group must be returned in full")
    assert(bySrc("big") === Curation.ReservoirK)
    // rn is a dense 1..min(n,k) rank within each group
    val ranks = out.filter(_.getString(0) == "big").map(_.getLong(1)).sorted
    assert(ranks === (1L to Curation.ReservoirK.toLong).toArray)
  }

  test("sample on the real corpus is unchanged by the threshold respelling") {
    // k smallest hashes per source are threshold-invariant as long as
    // they pass the pre-filter; this pins the fix as output-neutral.
    val out = Curation.reservoirSample(spark, "/root/testdata/sf0.001")
    val counts = out.groupBy("source").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) === Curation.ReservoirK.toLong))
  }
}
