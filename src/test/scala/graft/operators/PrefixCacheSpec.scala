package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X93 — the shared-prefix group report. Brute-force recount over raw
  * strings (independent of the engine's h60 keys) plus the accounting
  * identities: Σ group_size·n_groups = corpus + re-emitted rows, the
  * injected re-emissions guarantee multi-doc groups exist, and
  * cacheable_tokens follows the (size−1)·K law on every row.
  */
class PrefixCacheSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("report equals the string-keyed brute force and its identities") {
    val docs = graft.Tables.documents(spark, Dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val union = docs.map(_._2) ++
      docs.filter(_._1 % 10 == 0).map(_._2 + " rerun variant tail")
    val groups = union
      .map(t => t.split(" ", -1).take(8).mkString(" "))
      .groupBy(identity).values.map(_.size).toSeq
    val expected = groups.groupBy(identity).toSeq
      .map { case (s, gs) =>
        (s.toLong, gs.size.toLong, s.toLong * gs.size, (s - 1L) * gs.size * 8) }
      .sortBy(_._1)
    val got = SparkEntry.queries("prefix_cache_report")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got $got\nexp $expected")
    assert(got.map(_._3).sum == union.size.toLong, "doc accounting broke")
    assert(got.exists(r => r._1 >= 2 && r._2 > 0),
      "injected re-emissions must produce multi-doc prefix groups")
    got.foreach { case (s, g, _, c) =>
      assert(c == (s - 1) * g * 8, s"cacheable law broke at size $s") }
  }
}
