package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** Laws for the r20 temporal variants (asof_nearest_tolerance /
  * attribution_report) at sf0.001, brute-force recomputed driver-side
  * on epoch-micro longs.
  */
class TemporalVariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def us(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables.events(spark, Dir)
      .selectExpr("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2)),
        r.getString(3), r.getDouble(4))).toSeq

  test("asof_nearest_tolerance: nearest view within 6h, ties backward, exact per purchase") {
    val tol = 21600L * 1000000L
    val rows = SparkEntry.queries("asof_nearest_tolerance")(spark, Dir).collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(us), r.getString(4)))
      .toSeq
    val viewsByUser = events.filter(_._4 == "view").groupBy(_._2)
      .view.mapValues(_.map(_._3).distinct.sorted).toMap
    val purchases = events.filter(_._4 == "purchase")
      .map(e => (e._1, e._2, e._3)).sortBy(_._1)
    assert(rows.size == purchases.size)
    val byId = rows.map(r => r._1 -> (r._2, r._3)).toMap
    purchases.foreach { case (id, uid, pts) =>
      val vs = viewsByUser.getOrElse(uid, Seq.empty)
      val prev = vs.filter(_ <= pts).lastOption.filter(v => pts - v <= tol)
      val next = vs.find(_ >= pts).filter(v => v - pts <= tol)
      val expect = (prev, next) match {
        case (Some(b), Some(f)) =>
          if (pts - b <= f - pts) (Some(b), "back") else (Some(f), "fwd")
        case (Some(b), None) => (Some(b), "back")
        case (None, Some(f)) => (Some(f), "fwd")
        case _ => (None, "none")
      }
      assert(byId(id) == expect, s"purchase $id")
    }
  }

  test("attribution_report: last-touch within 3 days, view beats click on ts ties, cents exact") {
    val tol = 3L * 86400L * 1000000L
    val rows = SparkEntry.queries("attribution_report")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val touchesByUser = events.filter(e => e._4 == "view" || e._4 == "click")
      .groupBy(_._2).view.mapValues(_.map(e => (e._3, e._4))).toMap
    val brute = events.filter(_._4 == "purchase").map { case (_, uid, pts, _, v) =>
      val cents = math.floor(v * 100).toLong
      val inWin = touchesByUser.getOrElse(uid, Seq.empty)
        .filter(t => t._1 <= pts && pts - t._1 <= tol)
      val tpe =
        if (inWin.isEmpty) "none"
        else inWin.maxBy(t => (t._1, if (t._2 == "view") 1 else 0))._2
      (tpe, cents)
    }
    val expect = brute.groupBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.map(_._2).sum)
    }.toSet
    assert(rows.toSet == expect)
    assert(rows.map(_._2).sum == brute.size, "every purchase attributed exactly once")
  }
}
