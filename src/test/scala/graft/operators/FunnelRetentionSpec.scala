package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Brute-force JVM oracles for the event-analytics pair
  * (funnel_report, retention_cohorts): both reports recomputed from
  * the raw events with plain Scala collections and compared exactly,
  * plus the structural invariants (funnel monotonicity, offset-0
  * retention ≡ 1000). */
class FunnelRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def events(): Array[(Long, Timestamp, String)] =
    graft.Tables.events(spark, Dir)
      .selectExpr("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))

  test("funnel_report equals the brute-force ordered-sequence funnel") {
    val ev = events()
    val byUser = ev.groupBy(_._1)
    // earliest qualifying completion per step, strictly after the prior
    def stepTimes(types: Seq[String]): Map[Long, Seq[Timestamp]] =
      byUser.flatMap { case (u, es) =>
        val ts = types.foldLeft(Option(Seq.empty[Timestamp])) {
          case (Some(acc), tpe) =>
            val after = es.filter(e => e._3 == tpe &&
              (acc.isEmpty || e._2.after(acc.last)))
            if (after.isEmpty) None
            else Some(acc :+ after.map(_._2).min((a: Timestamp, b: Timestamp) =>
              a.compareTo(b)))
          case (None, _) => None
        }
        ts.map(u -> _)
      }
    val steps = Seq("view", "click", "purchase")
    val counts = (1 to steps.length).map(k =>
      stepTimes(steps.take(k)).size.toLong)
    val expected = counts.zipWithIndex.map { case (n, i) =>
      val prev = if (i == 0) n else counts(i - 1)
      (i + 1L, steps(i), n, if (prev == 0) 0L else n * 1000L / prev)
    }.toSet
    val got = SparkEntry.queries("funnel_report")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"funnel diverges:\n got $got\n exp $expected")
    // monotone: each step's users ⊆ previous step's
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(counts.head > 0, "degenerate testdata: nobody viewed")
  }

  test("retention_cohorts equals the brute-force triangle; offset 0 is 1000") {
    val ev = events()
    // ISO-Monday week truncation, matching date_trunc('week', ·) in
    // both engines: truncate to local-date Monday 00:00
    def week(t: Timestamp): java.time.LocalDate = {
      val d = t.toLocalDateTime.toLocalDate
      d.minusDays(d.getDayOfWeek.getValue - 1L)
    }
    val byUser = ev.groupBy(_._1).view.mapValues(_.map(e => week(e._2)).distinct)
    val cohortOf = byUser.mapValues(_.min((a: java.time.LocalDate, b: java.time.LocalDate) =>
      a.compareTo(b))).toMap
    val cells = byUser.toSeq.flatMap { case (u, ws) =>
      ws.map(w => (cohortOf(u),
        java.time.temporal.ChronoUnit.DAYS.between(cohortOf(u), w) / 7))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cells.map { case ((cw, off), n) =>
      (Timestamp.valueOf(cw.atStartOfDay()), off, n, sizes(cw),
        n * 1000L / sizes(cw))
    }.toSet
    val got = SparkEntry.queries("retention_cohorts")(spark, Dir).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected, s"retention diverges:\n got $got\n exp $expected")
    // a user's first event is in their cohort week
    got.filter(_._2 == 0L).foreach { case (cw, _, n, size, pm) =>
      assert(n == size && pm == 1000L, s"offset-0 cell of $cw must be full")
    }
  }
}
