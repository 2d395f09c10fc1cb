package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** Laws for the r20 warehouse/audit quartet (fk_orphan_audit /
  * lang_source_lift / zone_map_prune_audit / hll_weekly_rollup) at
  * sf0.001.
  */
class WarehouseOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("fk_orphan_audit: five relationships, counts consistent, synthetic star is orphan-free or exact") {
    val rows = SparkEntry.queries("fk_orphan_audit")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.size == 5)
    assert(rows.map(_._1).distinct.size == 5)
    rows.foreach { case (rel, child, orphan, permille) =>
      assert(orphan >= 0 && orphan <= child, rel)
      assert(permille == orphan * 1000 / child, rel)
    }
    // child_rows must equal the actual child table sizes
    val li = Tables.lineitem(spark, Dir).count()
    val ord = Tables.orders(spark, Dir).count()
    val cust = Tables.customer(spark, Dir).count()
    val byRel = rows.map(r => r._1 -> r._2).toMap
    assert(byRel("lineitem.orderkey->orders") == li)
    assert(byRel("lineitem.partkey->part") == li)
    assert(byRel("lineitem.suppkey->supplier") == li)
    assert(byRel("orders.custkey->customer") == ord)
    assert(byRel("customer.nationkey->nation") == cust)
    // brute-force one relationship end-to-end
    val orderKeys = Tables.orders(spark, Dir).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val orphans = Tables.lineitem(spark, Dir).select("l_orderkey").collect()
      .count(r => !orderKeys.contains(r.getLong(0))).toLong
    assert(byRel.size == 5 && rows.find(_._1 == "lineitem.orderkey->orders").get._3 == orphans)
  }

  test("lang_source_lift: marginal identities and exact integer lift") {
    val rows = SparkEntry.queries("lang_source_lift")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val docs = Tables.documents(spark, Dir).select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val n = docs.size.toLong
    val brute = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => ((r._1, r._2), r._3)).toMap == brute)
    val nLang = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nSrc = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (l, s, c, expected, lift) =>
      assert(expected == nLang(l) * nSrc(s) / n)
      assert(lift == c * 1000L * n / (nLang(l) * nSrc(s)), s"($l,$s)")
    }
    // Σ observed over a language's row group = that language's marginal
    rows.groupBy(_._1).foreach { case (l, g) =>
      assert(g.map(_._3).sum == nLang(l))
    }
  }

  test("zone_map_prune_audit: prune verdicts match the manifest, lang_b prunes meaningfully") {
    val manifest = SparkEntry.queries("zorder_layout")(spark, Dir).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))) // len/lang min/max
    val rows = SparkEntry.queries("zone_map_prune_audit")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.size == 32)
    rows.foreach { case (dim, v, nf, np, permille) =>
      assert(nf == manifest.length.toLong)
      val brute = dim match {
        case "len_b"  => manifest.count(m => v < m._1 || v > m._2).toLong
        case "lang_b" => manifest.count(m => v < m._3 || v > m._4).toLong
      }
      assert(np == brute, s"$dim=$v")
      assert(permille == np * 1000 / nf)
    }
    // the Morton claim: the SECOND dimension must also prune (> 0 overall),
    // which a lexicographic len-then-lang sort would fail
    val langPruned = rows.filter(_._1 == "lang_b").map(_._4).sum
    assert(langPruned > 0, "zone maps on lang_b prune nothing — Morton claim broken")
  }

  test("hll_weekly_rollup: month merge equals a direct month sketch; exact side exact") {
    val rows = SparkEntry.queries("hll_weekly_rollup")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.nonEmpty)
    // exact side against brute force (weeks→month via the Monday rule)
    val ev = Tables.events(spark, Dir).select("event_type", "ts", "user_id").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant, r.getLong(2))).toSeq
    def monthOfWeek(i: java.time.Instant): java.time.LocalDate = {
      val d = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC).toLocalDate
      val monday = d.minusDays(d.getDayOfWeek.getValue - 1L)
      monday.withDayOfMonth(1)
    }
    val brute = ev.groupBy(e => (e._1, monthOfWeek(e._2))).view
      .mapValues(_.map(_._3).distinct.size.toLong).toMap
    val got = rows.map { case (t, m, _, ex, _) =>
      // ofInstant(UTC), not toLocalDateTime: the latter renders in the
      // JVM default TZ (the RetentionStream advice-item trap)
      ((t, java.time.LocalDateTime.ofInstant(m.toInstant, java.time.ZoneOffset.UTC)
        .toLocalDate), ex)
    }.toMap
    assert(got == brute)
    // estimate sanity: positive whenever the group is non-empty
    rows.foreach { case (t, m, nw, ex, est) =>
      assert(nw >= 1 && ex >= 1 && est >= 1, s"($t,$m)")
    }
  }
}
