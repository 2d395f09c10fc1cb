package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Brute-force JVM oracles for dataset_card_report and rfm_segments. */
class CardRfmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("dataset_card_report equals the brute-force corpus summary") {
    val docs = spark.read.parquet(s"$Dir/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val nDocs = docs.length.toLong
    val nTokens = docs.map(_._2.split(" ", -1).length.toLong).sum
    val nChars = docs.map(_._5).sum
    val nLangs = docs.map(_._3).distinct.length.toLong
    val nSources = docs.map(_._4).distinct.length.toLong
    val nDistinct = docs.map(_._2).distinct.length.toLong
    val nKeep = docs.count { d =>
      d._2.split(" ", -1).map(t => Featurize.weight((h60(t) % 16).toInt)).sum >= 0
    }.toLong
    val expected = (nDocs, nTokens, nChars, nLangs, nSources,
      nTokens / nDocs, (nDocs - nDistinct) * 1000L / nDocs, nKeep * 1000L / nDocs)
    val r = SparkEntry.queries("dataset_card_report")(spark, Dir).collect()
    assert(r.length == 1, "the card is ONE row")
    val got = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4), r(0).getLong(5), r(0).getLong(6), r(0).getLong(7))
    assert(got == expected, s"card diverges:\n got $got\n exp $expected")
  }

  test("rfm_segments equals the brute-force segmentation") {
    val p = graft.Tables.events(spark, Dir)
      .selectExpr("user_id", "ts", "value", "event_type").collect()
      .filter(_.getString(3) == "purchase")
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val now = p.map(_._2.toLocalDateTime.toLocalDate).max(
      (a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val expected = p.groupBy(_._1).map { case (u, es) =>
      val last = es.map(_._2.toLocalDateTime.toLocalDate).max(
        (a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
      val rec = java.time.temporal.ChronoUnit.DAYS.between(last, now)
      val freq = es.length.toLong
      val cents = es.map(e => math.floor(e._3 * 100).toLong).sum
      val r = if (rec <= 2) 2L else if (rec <= 7) 1L else 0L
      val f = if (freq >= 15) 2L else if (freq >= 8) 1L else 0L
      val m = if (cents >= 30000) 2L else if (cents >= 15000) 1L else 0L
      (u, rec, freq, cents, r * 100 + f * 10 + m)
    }.toSet
    val got = SparkEntry.queries("rfm_segments")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"rfm diverges: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    // segmentation is not degenerate on the testdata: >1 distinct segment
    assert(got.map(_._5).size > 1, "all users in one segment — cuts are off the data")
  }
}
