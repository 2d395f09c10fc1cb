package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Span corruption pinned by a full independent Scala reimplementation
  * (mask coin, sentinel compaction, target construction, h60
  * fingerprints) plus the T5 geometry identities that must hold for
  * every doc: input length = n_tokens − n_masked + n_spans, target
  * carries n_masked + n_spans tokens, spans ≤ masked, and a doc with
  * no masked token round-trips unchanged. */
class SpanCorruptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def reference(): Seq[(Long, Long, Long, Long, Long, Long)] =
    graft.Tables.documents(spark, Dir).select("doc_id", "text").collect()
      .map { r =>
        val docId = r.getLong(0)
        val words = r.getString(1).split(" ", -1)
        val m = words.indices.map(i0 =>
          h60(s"mask:$docId:${i0 + 1}") % 1000 < 150)
        def runStart(i0: Int) = m(i0) && (i0 == 0 || !m(i0 - 1))
        val input = words.indices.flatMap { i0 =>
          if (runStart(i0)) Some("<extra_id>")
          else if (m(i0)) None
          else Some(words(i0))
        }.mkString(" ")
        val target = words.indices.flatMap { i0 =>
          if (runStart(i0)) Some(s"<extra_id> ${words(i0)}")
          else if (m(i0)) Some(words(i0))
          else None
        }.mkString(" ")
        (docId, words.length.toLong, m.count(identity).toLong,
          words.indices.count(runStart).toLong, h60(input), h60(target))
      }.toSeq.sortBy(_._1)

  test("registered query equals the independent reimplementation") {
    val got = SparkEntry.queries("span_corruption")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty)
    assert(got == reference(), "corruption diverges from the Scala reimplementation")
  }

  test("T5 geometry identities hold for every doc") {
    val rows = SparkEntry.queries("span_corruption")(spark, Dir).collect()
    val masked = rows.count(_.getLong(2) > 0)
    assert(masked > 0, "corpus must exercise the masking path")
    val unchangedFp = h60("") // a zero-mask doc's target is the empty string
    rows.foreach { r =>
      val (nTok, nMask, nSpan) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSpan <= nMask, "a span needs at least one masked token")
      assert(nMask <= nTok)
      if (nMask == 0) assert(r.getLong(5) == unchangedFp,
        "zero-mask doc must have the empty target fingerprint")
      if (nMask == nTok && nTok > 0) assert(nSpan >= 1)
    }
  }
}
