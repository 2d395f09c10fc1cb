package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X95 — the learned-score vs rule-gate calibration table. Brute-force
  * recount from raw documents: the 4-bit ablation mask and the X35
  * linear score are recomputed per doc (md5-prefix h60 twin for the
  * token hash), binned by the same shift-trick per-token score, and
  * the whole table compared. Accounting identities on top: bins
  * partition the corpus, and clean counts can never exceed bin size. */
class QualityCalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val BinWidth = 101L
  private val MaxBin = 9L
  private val Shift = 504L

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("table equals the brute-force recount from raw documents") {
    val docs = spark.read.parquet(s"$Dir/documents.parquet")
      .selectExpr("text", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perDoc = docs.map { case (text, nChars) =>
      val ws = text.split(" ", -1)
      val nTok = ws.length.toLong
      val nTypes = ws.distinct.length.toLong
      val nStop = ws.count(w => w == "a" || w == "the").toLong
      val charsInWords = nChars - nTok + 1
      val mask = (if (nTok < 20) 8L else 0L) +
        (if (nTypes * 100 < nTok * 15) 4L else 0L) +
        (if (nStop * 5 > nTok) 2L else 0L) +
        (if (charsInWords < 3 * nTok || charsInWords > 8 * nTok) 1L else 0L)
      val score = ws.map(w =>
        Featurize.weight(math.floorMod(h60(w), Featurize.Dim).toInt)).sum
      val bin = math.min(((score + nTok * Shift) / nTok) / BinWidth, MaxBin)
      (bin, mask)
    }
    val expected = perDoc.groupBy(_._1).toSeq.map { case (bin, ds) =>
      val clean = ds.count(_._2 == 0L).toLong
      (bin, bin * BinWidth - Shift, ds.length.toLong, clean,
        clean * 1000 / ds.length)
    }.sortBy(_._1)
    val got = SparkEntry.queries("quality_calibration_bins")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty)
    assert(got == expected,
      s"calibration diverges:\n got $got\n exp $expected")
    assert(got.map(_._3).sum == docs.length.toLong, "bins must partition the corpus")
    got.foreach { case (bin, lo, n, clean, pm) =>
      assert(bin >= 0 && bin <= MaxBin, s"bin $bin out of range")
      assert(lo == bin * BinWidth - Shift, s"bin_lo law broke at $bin")
      assert(clean >= 0 && clean <= n, s"clean count out of range at $bin")
      assert(pm == clean * 1000 / n, s"permille law broke at $bin")
    }
  }
}
