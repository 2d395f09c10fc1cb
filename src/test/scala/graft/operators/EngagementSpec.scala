package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Brute-force JVM oracles for the engagement pair (stickiness_report,
  * json_props_histogram): both recomputed from raw events with plain
  * Scala collections and compared exactly. */
class EngagementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def events(): Array[(Long, Timestamp, String, Double)] =
    graft.Tables.events(spark, Dir)
      .selectExpr("user_id", "ts", "props", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))

  test("stickiness_report equals the brute-force DAU/WAU; DAU <= WAU always") {
    val ud = events().map { case (u, ts, _, _) =>
      (u, ts.toLocalDateTime.toLocalDate)
    }.distinct
    val days = ud.map(_._2).distinct
    val expected = days.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter { case (_, w) =>
        !w.isAfter(d) && !w.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
      (Timestamp.valueOf(d.atStartOfDay()), dau, wau, dau * 1000L / wau)
    }.toSet
    val got = SparkEntry.queries("stickiness_report")(spark, Dir).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"stickiness diverges:\n got ${got.take(3)}...\n")
    got.foreach { case (d, dau, wau, pm) =>
      assert(dau <= wau && pm <= 1000, s"$d: DAU $dau > WAU $wau")
    }
  }

  test("user_path_ngrams equals the brute-force per-user path census") {
    val byUser = graft.Tables.events(spark, Dir)
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val paths = byUser.values.flatMap { es =>
      val order = es.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      order.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq
    val total = paths.length.toLong
    val expected = paths.groupBy(identity).map { case (p, xs) =>
      (p, xs.size.toLong, xs.size.toLong * 1000L / total)
    }.toSet
    val got = SparkEntry.queries("user_path_ngrams")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"paths diverge: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    assert(got.size > 1 && got.size <= 125, "path space must be bounded at 5^3")
  }

  test("json_props_histogram equals the brute-force extraction rollup") {
    val K = """"k"\s*:\s*(-?\d+)""".r
    val rows = events().flatMap { case (_, _, props, v) =>
      K.findFirstMatchIn(props).map(m => (m.group(1).toLong, v))
    }
    val expected = rows.groupBy { case (k, _) => (k / 10) * 10 }
      .map { case (b, es) =>
        (b, es.length.toLong, es.map(e => BigDecimal(e._2)).sum.toDouble)
      }.toSet
    val got = SparkEntry.queries("json_props_histogram")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact integers; the value sum is decimal-pinned so compare at
    // decimal precision (the double cast is the last op in both)
    def key(t: (Long, Long, Double)) = (t._1, t._2)
    assert(got.map(key) == expected.map(key),
      s"histogram diverges:\n got $got\n exp $expected")
    val em = expected.map(t => key(t) -> t._3).toMap
    got.foreach { case t =>
      assert(math.abs(em(key(t)) - t._3) < 1e-6, s"value mass differs at ${t._1}")
    }
  }
}
