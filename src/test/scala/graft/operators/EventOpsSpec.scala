package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** Laws for the r20 event-stream family (anomaly_mad / scd2_history /
  * hourly_seasonality / markov_transitions) at sf0.001, each checked
  * against a driver-side brute-force recompute of the same definition.
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  /** (user_id, ts-millis, event_id, event_type) ordered the queries' way. */
  private lazy val events: Seq[(Long, Long, Long, String)] =
    Tables.events(spark, Dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .toSeq.sortBy(t => (t._1, t._2, t._3))

  // --- anomaly_mad -------------------------------------------------------

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.size + 1) / 2 - 1)
  }

  test("anomaly_mad: med/mad are the lower medians and the verdict is exactly the 3-MAD rule") {
    val rows = SparkEntry.queries("anomaly_mad")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(rows.nonEmpty)
    val dayMs = 86400000L
    val daily = events.groupBy(e => (e._4, e._2 - Math.floorMod(e._2, dayMs)))
      .view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2)).toSet == daily.keySet, "one row per (type, day)")
    val medByType = daily.groupBy(_._1._1).view
      .mapValues(m => lowerMedian(m.values.toSeq)).toMap
    val madByType = daily.groupBy(_._1._1).view.mapValues { m =>
      val med = lowerMedian(m.values.toSeq)
      lowerMedian(m.values.map(n => math.abs(n - med)).toSeq)
    }.toMap
    rows.foreach { case (tpe, day, n, med, mad, flag) =>
      assert(n == daily((tpe, day)))
      assert(med == medByType(tpe), s"median of $tpe")
      assert(mad == madByType(tpe), s"MAD of $tpe")
      assert(flag == (math.abs(n - med) > 3 * mad))
    }
  }

  // --- scd2_history ------------------------------------------------------

  test("scd2_history: dense versions, chained intervals, one current row, runs collapsed") {
    val rows = SparkEntry.queries("scd2_history")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        Option(r.getTimestamp(3)).map(_.getTime), r.getLong(4), r.getBoolean(5)))
      .toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val byV = vs.sortBy(_._5)
      assert(byV.map(_._5) == (1L to vs.size).toSeq, s"user $uid versions not dense")
      byV.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3), s"user $uid: interval v${a._5} not closed by v${b._5}")
          assert(a._2 != b._2, s"user $uid: consecutive versions share type — run not collapsed")
        case _ => ()
      }
      assert(byV.count(_._6) == 1 && byV.last._6, s"user $uid: is_current must mark exactly the last version")
      assert(byV.last._4.isEmpty, s"user $uid: current version must be open-ended")
    }
    // version count = the change-point count of the raw ordered stream
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      1 + types.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    }.toMap
    assert(rows.groupBy(_._1).view.mapValues(_.size).toMap == expected)
  }

  // --- hourly_seasonality --------------------------------------------------

  test("hourly_seasonality: counts partition the stream, shares and peaks exact") {
    val rows = SparkEntry.queries("hourly_seasonality")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows.map(_._3).sum == events.size, "hour cells partition the stream")
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      val total = g.map(_._3).sum
      val mx = g.map(_._3).max
      g.foreach { case (_, h, n, share, peak) =>
        assert(h >= 0 && h <= 23)
        assert(share == n * 1000 / total, s"($tpe, $h)")
        assert(peak == (n == mx))
      }
      assert(g.count(_._5) >= 1, s"$tpe must flag at least one peak hour")
    }
  }

  // --- markov_transitions ------------------------------------------------

  test("markov_transitions: counts and conditional permilles match the brute-force matrix") {
    val rows = SparkEntry.queries("markov_transitions")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val brute = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => ((r._1, r._2), r._3)).toMap == brute)
    val totals = brute.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    rows.foreach { case (p, n, c, permille) =>
      assert(permille == c * 1000 / totals(p), s"P($n|$p)")
    }
    // each prev row group's permilles sum to 1000 - (rounding loss < fanout)
    rows.groupBy(_._1).foreach { case (p, g) =>
      val s = g.map(_._4).sum
      assert(s <= 1000 && s > 1000 - g.size, s"prev $p permille sum $s")
    }
  }
}
