package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X139 law spec: the per-(type, day) histogram quantiles equal the
  * from-scratch sorted-list discrete quantile (min x with
  * rank(x) ≥ ⌈q·n⌉) computed in plain Scala, and the trend is
  * consistent with the corpus-wide X134 quantiles (per-day P99 never
  * below the day's P50, every (type, day) present). */
class DailyQuantileTrendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("equals the sorted-list discrete quantile per (type, day)") {
    val rows = graft.Tables.events(spark, Dir)
      .selectExpr("event_type", "CAST(date_trunc('DAY', ts) AS STRING) AS day", "value")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        math.floor(r.getDouble(2) * 100).toLong))
    val expected = rows.groupBy(_._1).flatMap { case ((t, d), vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      Seq(500L, 900L, 990L).map { q =>
        // min cents with cum >= ceil(q*n/1000): index ceil(q*n/1000)-1
        val k = ((q * n + 999) / 1000).toInt
        ((t, d, q), sorted(k - 1))
      }
    }
    val got = SparkEntry.queries("daily_quantile_trend")(spark, Dir)
      .selectExpr("event_type", "CAST(day AS STRING)", "q_permille", "cents_q")
      .collect().map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(3)))
      .toMap
    assert(got.nonEmpty && got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"quantile mismatch at $k: got ${got(k)}, expected $v")
    }
  }

  test("band sanity: P50 <= P90 <= P99 within every (type, day)") {
    val byKey = SparkEntry.queries("daily_quantile_trend")(spark, Dir)
      .selectExpr("event_type", "CAST(day AS STRING)", "q_permille", "cents_q")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
    byKey.foreach { case (k, qs) =>
      val m = qs.map(_._2).toMap
      assert(m.size == 3, s"$k missing lattice points: $m")
      assert(m(500L) <= m(900L) && m(900L) <= m(990L), s"band inversion at $k: $m")
    }
  }
}
