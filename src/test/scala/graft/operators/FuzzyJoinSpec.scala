package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X82 — the deletion-neighborhood edit-distance join. The candidate
  * scheme's completeness is a THEOREM (ed ≤ 1 strings share a member of
  * each other's {s} ∪ del₁(s)), so the spec checks it wholesale: the
  * operator's output must EQUAL a brute-force all-pairs levenshtein
  * sweep over the same fingerprints (the cap never trips on testdata —
  * max bucket 4 vs cap 64 — so nothing is legitimately dropped).
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("output equals the brute-force ed<=1 pair set (completeness law)") {
    import org.apache.spark.sql.functions._
    val fps = graft.Tables.documents(spark, Dir)
      .select(col("doc_id"), expr(
        "array_join(transform(slice(split(text, ' ', -1), 1, 16), " +
          "w -> substring(w, 1, 1)), '')").as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ida, fpa) <- fps; (idb, fpb) <- fps
      if ida < idb && math.abs(fpa.length - fpb.length) <= 1
      d = lev(fpa, fpb) if d <= 1
    } yield (ida, idb, d.toLong)).toSet

    val got = SparkEntry.queries("fuzzy_fingerprint_join")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
    assert(brute.exists(_._3 == 1L),
      "the ed=1 path must be exercised on this corpus (non-vacuous green)")
    assert(got.forall { case (a, b, d) => a < b && d >= 0 && d <= 1 })
  }
}
