package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X85 — the train→test n-gram coverage curve. The whole report is
  * re-derived brute-force in the driver (dataset_split's own hash coin
  * for split tags, raw STRING gram types — independent of the engine's
  * h60 gram keys, so a hash collision or slice bug would diverge) and
  * must match row for row. Also pins the curve's diagnostic value: it
  * must actually fall with n on this corpus.
  */
class CoverageCurveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("curve equals a string-keyed brute-force recount and falls with n") {
    val split = SparkEntry.queries("dataset_split")(spark, Dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val docs = graft.Tables.documents(spark, Dir)
      .select("doc_id", "text").collect()
      .map(r => split(r.getLong(0)) -> r.getString(1).split(" ", -1))
      .filter(_._1 != "val")
    val expected = (1 to 4).map { n =>
      def types(s: String) = docs.filter(_._1 == s)
        .flatMap(_._2.sliding(n).filter(_.length == n).map(_.mkString(" ")))
        .toSet
      val train = types("train"); val test = types("test")
      val covered = (test & train).size.toLong
      (n.toLong, test.size.toLong, covered, covered * 1000 / test.size)
    }
    val got = SparkEntry.queries("ngram_coverage_curve")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexp $expected")
    assert(got.head._4 > got.last._4,
      "coverage must fall from n=1 to n=4 (a flat curve carries no signal)")
  }
}
