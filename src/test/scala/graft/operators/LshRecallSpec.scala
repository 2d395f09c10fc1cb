package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** S-curve mechanics the oracle hash states only implicitly: the
  * recall audit is brute-force recomputed from the registered
  * agreement relation with BigInt arithmetic (proving the int64
  * spelling never overflowed), sharper banding (more rows per band)
  * never raises expected recall, and the registry's own (4, 3)
  * operating point behaves like the S-curve says it should on the
  * structural n_agree ≥ 3 floor. */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val Configs = Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1))

  private def pMicro(a: Long, b: Int, r: Int): BigInt = {
    val miss = BigInt(12).pow(r) - BigInt(a).pow(r)
    BigInt(1000000) - (BigInt(1000000) * miss.pow(b)) / BigInt(12).pow(12)
  }

  test("report equals the BigInt brute force over the agreement relation") {
    val agrees = SparkEntry.queries("minhash_jaccard_estimate")(spark, Dir)
      .select("n_agree").collect().map(_.getLong(0))
    assert(agrees.nonEmpty)
    val expected = Configs.map { case (b, r) =>
      (b.toLong, r.toLong) ->
        (agrees.length.toLong, agrees.map(a => pMicro(a, b, r)).sum)
    }.toMap
    val got = SparkEntry.queries("lsh_band_recall")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), BigInt(r.getLong(3)))).toMap
    assert(got == expected,
      s"recall audit diverges from BigInt brute force:\n got $got\n exp $expected")
  }

  test("sharper banding never raises expected recall; endpoints behave") {
    val rows = SparkEntry.queries("lsh_band_recall")(spark, Dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val byRows = rows.map { case (r, n, e) => r -> (n, e) }.toMap
    assert(byRows.size == Configs.size)
    // all configs see the same pair set
    assert(byRows.values.map(_._1).toSet.size == 1)
    // expected recall is monotone DECREASING in rows-per-band (the
    // S-curve sharpens): r=1 (12 bands of 1) detects the most,
    // r=12 (one 12-hash band) the least
    val ordered = byRows.toSeq.sortBy(_._1).map(_._2._2)
    ordered.sliding(2).foreach {
      case Seq(hi, lo) => assert(hi >= lo,
        s"recall rose with sharper banding: $ordered")
      case _ =>
    }
    // structural floor: every candidate agrees on >= 3 hashes (one full
    // band), so the 12-bands-of-1 config detects essentially everything
    val (nPairs, eR1) = byRows(1L)
    assert(eR1 >= nPairs * 900000L,
      s"r=1 should catch nearly every observed candidate: $eR1 of $nPairs")
  }
}
