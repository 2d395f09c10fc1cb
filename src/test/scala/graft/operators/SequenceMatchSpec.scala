package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X140 law spec: the registered report equals a from-scratch JVM
  * brute force (per-user journey strings via plain Scala sorting,
  * java.util.regex unanchored find), and the symbol alphabet stays
  * injective over the harness event-type inventory. */
class SequenceMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private val Patterns = Seq("v.*p", "vp", "e{3,}", "p.*e", "s.*p")

  test("event-type first letters are distinct — the symbol map is injective") {
    val types = graft.Tables.events(spark, Dir)
      .select("event_type").distinct().collect().map(_.getString(0)).toSeq
    assert(types.nonEmpty)
    assert(types.map(_.take(1)).distinct.size == types.size,
      s"first letters collide in $types — the journey alphabet is broken")
  }

  test("report equals the JVM brute force on the harness corpus") {
    val events = graft.Tables.events(spark, Dir)
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    val journeys = events.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4.take(1)).mkString
    }.toSeq
    val total = journeys.size.toLong
    val expected = Patterns.sorted.map { p =>
      val rx = java.util.regex.Pattern.compile(p)
      val n = journeys.count(s => rx.matcher(s).find()).toLong
      (p, n, n * 1000 / total)
    }
    val got = SparkEntry.queries("sequence_match_report")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the corpus exercises the report: at least one pattern matches
    // someone and at least one pattern is rarer than another
    assert(got.map(_._2).max > 0)
    assert(got.map(_._2).distinct.size > 1)
  }
}
