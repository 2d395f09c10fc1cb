package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The verify stage's ground truth at sf0.001: every planted near-dup
  * pair (doc vs its first-word-dropped re-crawl) must be confirmed with
  * the EXACT edit distance the construction implies — the prefix edit
  * distance equals the dropped "word + space" length whenever the tail
  * survives truncation — and the keep verdict must be true for all of
  * them. */
class EditDistanceVerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("planted re-crawl pairs verify as dups with the constructed distance") {
    val out = SparkEntry.queries("edit_distance_verify")(spark, Dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val docs = graft.Tables.documents(spark, Dir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val planted = out.keySet.filter { case (a, b) => b == a + Dedup.ReKeyA }
    assert(planted.nonEmpty, "no planted candidate pairs — vacuous test")
    planted.foreach { case (a, b) =>
      val (lev, permille, isDup) = out((a, b))
      val text = docs(a)
      val dropped = text.indexOf(' ') + 1 // first word + the space
      // prefix semantics: doc A's 256-char prefix vs doc B's = A shifted
      // left by `dropped`; when A is longer than 256+dropped both
      // prefixes are full, so the optimal alignment deletes `dropped`
      // chars then pays for the tail characters B sees but A's window
      // cut off — bounded by 2·dropped; short docs degrade to exactly
      // `dropped` deletions
      assert(lev >= dropped && lev <= 2L * dropped,
        s"pair ($a,$b): lev=$lev outside [$dropped, ${2 * dropped}] (dropped=$dropped, len=${text.length})")
      if (text.length <= 256) assert(lev == dropped,
        s"pair ($a,$b): untruncated pair must pay exactly the dropped prefix")
      assert(isDup, s"planted near-dup ($a,$b) rejected (permille=$permille)")
    }
  }
}
