package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** histogram_quantiles must equal the sort-based discrete quantile:
  * per (type, q), the ⌈q·n/1000⌉-th smallest cents value. */
class HistogramQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("histogram path equals the sorted-list discrete quantile exactly") {
    val rows = SparkEntry.queries("histogram_quantiles")(spark, Dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val vals = Tables.events(spark, Dir).selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    assert(rows.nonEmpty && rows.keySet.map(_._1) == vals.keySet)
    for ((tpe, sorted) <- vals; q <- Seq(500L, 900L, 990L)) {
      val k = ((sorted.size * q + 999) / 1000).toInt // ceil(q·n/1000), 1-based
      assert(rows((tpe, q)) == sorted(k - 1), s"($tpe, P$q)")
    }
  }
}
