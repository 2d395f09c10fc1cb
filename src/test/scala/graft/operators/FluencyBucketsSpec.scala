package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The tercile mechanics the oracle hash states only implicitly: tier
  * labels track the tercile number, buckets within a language are
  * SQL-standard ntile (sizes differ by ≤ 1, earlier buckets take the
  * remainder), and assignment follows the (fluency DESC, doc_id) total
  * order exactly — recomputed brute-force from the output itself, so a
  * drift in either engine's remainder placement fails here before it
  * fails the cross-engine hash. */
class FluencyBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("per-language terciles follow the total order with SQL ntile sizing") {
    val rows = SparkEntry.queries("fluency_buckets")(spark, Dir)
      .select("doc_id", "lang", "fluency", "tercile", "tier")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, _, t, tier) =>
      assert(t >= 1 && t <= 3, s"doc $id: tercile $t out of range")
      assert(tier == Seq("head", "middle", "tail")(t.toInt - 1),
        s"doc $id: tier label $tier diverges from tercile $t")
    }
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val inOrder = docs.sortBy(d => (-d._3, d._1))
      // SQL ntile: n docs over 3 buckets → first (n mod 3) buckets get
      // ceil(n/3), the rest floor(n/3), assigned in order
      val n = inOrder.length
      val (q, r) = (n / 3, n % 3)
      val expected = (1 to 3).flatMap(b => Seq.fill(q + (if (b <= r) 1 else 0))(b.toLong))
      assert(inOrder.map(_._4).toSeq == expected,
        s"$lang: tercile assignment diverges from brute-force ntile over " +
          s"the (fluency DESC, doc_id) order")
      // every language with ≥ 3 docs must populate all three tiers
      if (n >= 3) assert(inOrder.map(_._4).distinct.length == 3)
    }
  }
}
