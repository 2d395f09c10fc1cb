package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** Laws for X137 containment_verify and X138 scd2_point_in_time at
  * sf0.001, brute-force recomputed. */
class ContainmentPitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("containment_verify: exact intersection/containment per LSH candidate, verdict exact") {
    val rows = SparkEntry.queries("containment_verify")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    val cands = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == cands, "one verdict per candidate pair")
    val sets = Dedup.withNearDupes(spark, Dir).select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ")
        r.getLong(0) -> (0 to w.length - 3).map(i =>
          s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      }.toMap
    rows.foreach { case (a, b, sa, sb, inter, perm, flag) =>
      val (xa, xb) = (sets(a), sets(b))
      assert(sa == xa.size && sb == xb.size)
      assert(inter == (xa intersect xb).size, s"($a,$b)")
      assert(perm == inter * 1000 / math.min(sa, sb))
      val jaccBelow = inter * 10 < (sa + sb - inter) * 6
      assert(flag == (perm >= 800 && jaccBelow))
    }
  }

  test("scd2_point_in_time: census equals interval containment over the history") {
    val hist = SparkEntry.queries("scd2_history")(spark, Dir).collect()
      .map(r => (r.getString(1), r.getTimestamp(2).getTime,
        Option(r.getTimestamp(3)).map(_.getTime)))
    val days = Tables.events(spark, Dir).select("ts").collect()
      .map(r => r.getTimestamp(0).getTime - Math.floorMod(r.getTimestamp(0).getTime, 86400000L))
      .distinct
    val brute = (for {
      d <- days
      (tpe, from, to) <- hist
      if d >= from && to.forall(d < _)
    } yield (d, tpe)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("scd2_point_in_time")(spark, Dir).collect()
      .map(r => ((r.getTimestamp(0).getTime, r.getString(1)), r.getLong(2))).toMap
    assert(got == brute)
    assert(got.nonEmpty)
  }
}
