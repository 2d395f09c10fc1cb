package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The completeness theorem `jaccard_prefix_join` exists for: at
  * τ = 0.6 its output must equal the brute-force ALL-PAIRS result —
  * every pair with shingle Jaccard ≥ τ, none missed (the prefix filter
  * is lossless), none extra (the verify stage is exact), all counts
  * exact. Brute force runs driver-side over the same injected near-dup
  * corpus at sf0.001. */
class JaccardPrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private type Pair = (Long, Long, Long, Long, Long)

  private lazy val got: Set[Pair] =
    SparkEntry.queries("jaccard_prefix_join")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  private lazy val shingleSets: Map[Long, Set[String]] = {
    // the same injected corpus the query reads (Dedup.withNearDupes)
    val d = Dedup.withNearDupes(spark, Dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    d.map { case (id, text) =>
      val w = text.split(" ")
      val sh =
        if (w.length < 3) Set.empty[String]
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      id -> sh
    }.toMap.filter(_._2.nonEmpty)
  }

  private lazy val brute: Set[Pair] = {
    val ids = shingleSets.keys.toSeq.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      inter = (shingleSets(a) intersect shingleSets(b)).size.toLong
      union = (shingleSets(a) union shingleSets(b)).size.toLong
      if inter * 10 >= union * 6
    } yield (a, b, inter, union, inter * 1000 / union)).toSet
  }

  test("exactly the all-pairs tau=0.6 result: complete (no misses) and exact (no extras)") {
    assert(brute.nonEmpty, "the injected near-dup corpus must contain qualifying pairs")
    val missed = brute -- got
    val extra = got -- brute
    assert(missed.isEmpty, s"prefix filter MISSED ${missed.size} qualifying pairs: ${missed.take(5)}")
    assert(extra.isEmpty, s"verify emitted ${extra.size} non-qualifying pairs: ${extra.take(5)}")
  }

  test("every emitted pair is at or above the threshold with exact arithmetic") {
    got.foreach { case (a, b, inter, union, permille) =>
      assert(inter * 10 >= union * 6, s"($a,$b) below tau")
      assert(permille == inter * 1000 / union)
      assert(union >= inter && inter >= 1)
    }
  }
}
