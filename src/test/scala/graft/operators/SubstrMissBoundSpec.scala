package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the X48 trade EXACTLY (the SURVEY/SCALE.md question "what do we
  * miss vs Lee et al.'s suffix array at 10-token granularity?"):
  * stride-1 N-token window hashing + islands recovers every repeat of
  * length ≥ SpanN TOKEN-EXACTLY (same boundaries, same maximal span a
  * suffix array truncated at threshold N reports) and misses every
  * repeat shorter than SpanN ENTIRELY. That is: the hash-window
  * respelling is not an approximation of suffix-array ExactSubstr at
  * matching threshold — it is the same detector, minus the suffix
  * array's ability to ALSO report sub-threshold matches (which
  * ExactSubstr discards anyway) and modulo 60-bit hash collisions
  * (~2⁻⁶⁰ per window pair, loud as a spurious span if it ever fires).
  *
  * Corpora here use globally unique filler tokens so the planted run is
  * provably the only repeated content; SpanN is pinned at 10 by the
  * assertions (a SpanN change must revisit this spec's arithmetic).
  */
class SubstrMissBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val N = 10 // must equal Dedup.SpanN; assertions below enforce behaviorally

  /** doc text = `pre` unique fillers, the planted tokens, `post` unique
    * fillers — fillers namespaced per doc so nothing repeats by accident. */
  private def doc(id: Long, pre: Int, planted: Seq[String], post: Int): (Long, String) = {
    val p = (0 until pre).map(i => s"u${id}a$i")
    val q = (0 until post).map(i => s"u${id}b$i")
    (id, (p ++ planted ++ q).mkString(" "))
  }

  private def spans(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Dedup.substrSpansOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
  }

  test("a planted 25-token repeat is recovered token-exactly at both occurrences") {
    val run = (0 until 25).map(i => s"r$i")
    val out = spans(Seq(doc(1L, 7, run, 12), doc(2L, 3, run, 20)))
    // span = exactly the planted [start, start+25): 16 repeated windows
    // (25 − 10 + 1) merge into one island per occurrence
    assert(out == Seq((1L, 7L, 32L, 16L), (2L, 3L, 28L, 16L)))
  }

  test("repeats shorter than SpanN are missed entirely — the documented trade") {
    val run9 = (0 until N - 1).map(i => s"s$i")
    assert(spans(Seq(doc(1L, 5, run9, 5), doc(2L, 8, run9, 2))).isEmpty,
      s"a ${N - 1}-token repeat must produce no ${N}-token repeated window")
    // and the boundary case: exactly SpanN tokens IS detected (1 window)
    val run10 = (0 until N).map(i => s"t$i")
    val out = spans(Seq(doc(1L, 5, run10, 5), doc(2L, 8, run10, 2)))
    assert(out == Seq((1L, 5L, 15L, 1L), (2L, 8L, 18L, 1L)))
  }

  test("two repeats separated by fewer than SpanN unique tokens stay distinct spans") {
    // windows straddling the unique gap are themselves unique, so the
    // islands cannot merge across it — boundaries stay surgical even
    // when the gap (3) is far below N
    val a = (0 until 12).map(i => s"x$i")
    val b = (0 until 14).map(i => s"y$i")
    def both(id: Long, pre: Int) = {
      val gap = (0 until 3).map(i => s"u${id}g$i")
      doc(id, pre, a ++ gap ++ b, 6)
    }
    val out = spans(Seq(both(1L, 4), both(2L, 9)))
    // doc 1: a at [4,16) (3 grams), b at [19,33) (5 grams); doc 2 shifted +5
    assert(out == Seq((1L, 4L, 16L, 3L), (1L, 19L, 33L, 5L),
      (2L, 9L, 21L, 3L), (2L, 24L, 38L, 5L)))
  }

  test("property: planted repeats of length N..40 recover spans of exactly that length") {
    val rnd = new scala.util.Random(481123)
    for (_ <- 1 to 8) {
      val len = N + rnd.nextInt(31)
      val p1 = rnd.nextInt(20)
      val p2 = rnd.nextInt(20)
      val run = (0 until len).map(i => s"p$i")
      val out = spans(Seq(doc(1L, p1, run, 5 + rnd.nextInt(10)),
        doc(2L, p2, run, 5 + rnd.nextInt(10))))
      assert(out == Seq(
        (1L, p1.toLong, (p1 + len).toLong, (len - N + 1).toLong),
        (2L, p2.toLong, (p2 + len).toLong, (len - N + 1).toLong)),
        s"len=$len p1=$p1 p2=$p2 → $out")
    }
  }
}
