package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The containment-matrix mechanics the oracle hash states only
  * implicitly: the registered report equals a brute-force Scala
  * recomputation from raw documents (string shingles — independently
  * of the engine's hashed spelling), shared counts are symmetric while
  * containment is deliberately NOT, and every row respects the
  * counting bounds. */
class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def reference(): Seq[(String, String, Long, Long, Long)] = {
    val docs = graft.Tables.documents(spark, Dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val bySrc: Map[String, Set[String]] = docs
      .flatMap { case (s, t) =>
        val w = t.split(" ")
        if (w.length < 3) Seq.empty
        else w.sliding(3).map(g => (s, g.mkString(" "))).toSeq
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcCount = bySrc.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val capped = bySrc.view.mapValues(
      _.filter(srcCount(_) <= Curation.OverlapSrcCap)).toMap
    (for {
      a <- capped.keys.toSeq; b <- capped.keys.toSeq if a != b
      shared = (capped(a) & capped(b)).size.toLong if shared > 0
    } yield (a, b, shared, capped(a).size.toLong,
      shared * 1000L / capped(a).size)).sortBy(r => (r._1, r._2))
  }

  test("registered matrix equals the brute-force string-shingle reference") {
    val got = SparkEntry.queries("source_overlap_matrix")(spark, Dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty, "harness corpus shares vocabulary — overlap must exist")
    assert(got == reference(),
      "matrix diverges from the independent string-shingle recomputation")
  }

  test("shared counts symmetric, containment asymmetric by design, bounds hold") {
    val rows = SparkEntry.queries("source_overlap_matrix")(spark, Dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val shared = rows.map { case (a, b, n, _, _) => (a, b) -> n }.toMap
    rows.foreach { case (a, b, n, na, cp) =>
      assert(shared.get((b, a)).contains(n), s"n_shared not symmetric for ($a,$b)")
      assert(n <= na, s"($a,$b): shared $n exceeds $a's capped set $na")
      assert(cp >= 0 && cp <= 1000, s"($a,$b): containment $cp out of range")
      assert(cp == n * 1000L / na, s"($a,$b): permille arithmetic")
    }
  }
}
