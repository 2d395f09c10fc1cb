package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X92 — the filter-ablation matrix. The whole report is re-derived
  * brute-force in the driver (plain Scala over the raw text — an
  * independent path from the SQL mask arithmetic), and the report's
  * accounting identities are pinned: n_total is the corpus size on
  * every row, n_kept + (docs flagged by ≥1 gate) = n_total,
  * n_unique ≤ n_flagged per gate, and the corpus actually exercises
  * the matrix (≥ 2 gates fire, and the union leaves a kept majority).
  */
class AblationMatrixSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("matrix equals brute force and satisfies the accounting identities") {
    val docs = graft.Tables.documents(spark, Dir)
      .select("text", "n_chars").collect()
      .map(r => (r.getString(0).split(" ", -1).toSeq, r.getLong(1)))
    val masks = docs.map { case (ws, nChars) =>
      val nTok = ws.size.toLong
      val nTyp = ws.distinct.size.toLong
      val nStop = ws.count(w => w == "a" || w == "the").toLong
      val chars = nChars - nTok + 1
      (if (nTok < 20) 8L else 0L) + (if (nTyp * 100 < nTok * 15) 4L else 0L) +
        (if (nStop * 5 > nTok) 2L else 0L) +
        (if (chars < 3 * nTok || chars > 8 * nTok) 1L else 0L)
    }
    val total = masks.size.toLong
    val kept = masks.count(_ == 0L).toLong
    val expected = Seq(("low_ttr", 4L), ("stopword_heavy", 2L), ("too_short", 8L),
      ("word_len", 1L)).map { case (g, bit) =>
      val flagged = masks.count(m => (m / bit) % 2 == 1).toLong
      val unique = masks.count(_ == bit).toLong
      (g, total, flagged, unique, kept, flagged * 1000 / total, unique * 1000 / total)
    }
    val got = SparkEntry.queries("filter_ablation_matrix")(spark, Dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected, s"got $got\nexp $expected")

    got.foreach { case (g, t, fl, un, kp, _, _) =>
      assert(t == total && kp == kept, s"$g: totals drifted")
      assert(un <= fl, s"$g: unique $un > flagged $fl")
    }
    assert(got.count(_._3 > 0) >= 2, "corpus must exercise >= 2 gates")
    assert(kept * 2 > total, "gates must keep a majority on this corpus")
  }
}
