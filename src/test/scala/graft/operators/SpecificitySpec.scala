package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X94 — per-source distinctive-bigram mining. Pins the machinery's
  * diagnostic value: every source's rank-1 gram must be its OWN
  * injected marker bigram (sdf = 1, cnt = 3 — the marker doc repeats
  * it three times), rank order must follow (sdf asc, cnt desc, gram)
  * within each source, and every source reports exactly K rows.
  */
class SpecificitySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("each source's top gram is its own marker; order law holds") {
    val rows = SparkEntry.queries("source_ngram_specificity")(spark, Dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val bySrc = rows.groupBy(_._1)
    val srcs = graft.Tables.documents(spark, Dir)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(bySrc.keySet == srcs, "every source must report")
    bySrc.foreach { case (src, rs) =>
      assert(rs.length == 5, s"$src: ${rs.length} rows")
      val top = rs.minBy(_._2)
      assert(top._3 == s"marker ${src}_sig" && top._5 == 1L && top._4 == 3L,
        s"$src rank-1: $top")
      val sorted = rs.sortBy(_._2)
      val keys = sorted.map(t => (t._5, -t._4, t._3))
      assert(keys.toSeq == keys.sortBy(identity).toSeq,
        s"$src: rank order violates (sdf asc, cnt desc, gram)")
    }
  }
}
