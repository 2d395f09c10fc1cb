package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Drift-report mechanics beyond the oracle hash: the registered
  * total-variation numbers are brute-force recomputed from raw tokens
  * (including the absent-term mass the plan adds via the P_total
  * identity rather than a source×vocabulary expansion), and constructed
  * corpora pin the distance's endpoints — a single source sits at 0, a
  * source with a disjoint vocabulary sits at its full mass distance. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val Scale = 1000000L

  test("registered report equals the brute-force TV over raw tokens") {
    val tokens = TestSpark.spark.read
      .parquet(s"$Dir/documents.parquet")
      .selectExpr("source", "explode(split(text, ' ')) AS term")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = tokens.length.toLong
    val ct = tokens.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pt = ct.view.mapValues(c => c * Scale / n).toMap
    val pTotal = pt.values.sum
    val bySrc = tokens.groupBy(_._1)
    val expected = bySrc.map { case (s, toks) =>
      val ns = toks.length.toLong
      val stc = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val dPresent = stc.map { case (t, c) => math.abs(c * Scale / ns - pt(t)) }.sum
      // keysIterator, not keys.map: mapping a key SET through pt would
      // deduplicate equal p_t values before the sum
      val ptPresent = stc.keysIterator.map(pt).sum
      s -> (stc.size.toLong, (dPresent + (pTotal - ptPresent)) / 2)
    }
    val got = SparkEntry.queries("source_unigram_drift")(spark, Dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    assert(got == expected,
      s"drift report diverges from brute-force TV:\n got $got\n exp $expected")
  }

  test("constructed corpora pin the endpoints") {
    val s = spark
    import s.implicits._
    // one source: its distribution IS the corpus distribution → TV 0
    val single = Seq(("only", "a b c a"), ("only", "b c d")).toDF("source", "text")
    val sv = Curation.driftCore(single).collect()
    assert(sv.length == 1 && sv.head.getLong(2) == 0L,
      s"single-source corpus must have zero drift: ${sv.toSeq}")
    // two equal-mass sources with disjoint vocabularies: each source's
    // TV is ½(Σ|1/k − 1/2k|·k + ½) = ½ of the total mass — 500000 micro
    // (exactly, since every division here is exact in micro units)
    val disjoint = Seq(("x", "a b c d"), ("y", "e f g h")).toDF("source", "text")
    val dv = Curation.driftCore(disjoint).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(dv == Map("x" -> 500000L, "y" -> 500000L),
      s"disjoint-vocabulary drift must be half the mass: $dv")
  }
}
