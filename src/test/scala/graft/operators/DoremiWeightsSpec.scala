package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The reweighting mechanics the oracle hash states only implicitly:
  * the registered report is brute-force recomputed from the shared
  * fluency relation, weights are monotone in excess loss, the smoothing
  * floor keeps every domain alive, and constructed loss profiles behave
  * (uniform corpus → uniform weights; one hard domain → weighted up).
  */
class DoremiWeightsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val Smooth = 10000L

  /** Reference reweighting over an explicit (source, fluency) doc list. */
  private def reference(docs: Seq[(String, Long)]): Map[String, (Long, Long, Long, Long)] = {
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val baseline = docs.map(_._2).sum / docs.size
    val perSrc = bySrc.map { case (s, fs) =>
      val fl = fs.sum / fs.size
      s -> (fs.size.toLong, fl, math.max(0L, baseline - fl))
    }
    val total = perSrc.values.map(_._3 + Smooth).sum
    perSrc.map { case (s, (n, fl, ex)) =>
      s -> (n, fl, ex, (ex + Smooth) * 1000L / total)
    }
  }

  test("registered report is the brute-force reweighting of the fluency relation") {
    val fl = TextAnalysis.bigramFluency(spark, Dir)
      .select("source", "fluency").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = reference(fl)
    val got = SparkEntry.queries("doremi_weights")(spark, Dir)
      .select("source", "n_docs", "fluency", "excess", "weight_permille")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    assert(got == expected,
      s"report diverges from brute-force reference:\n got $got\n exp $expected")
  }

  test("weights are monotone in excess, sum to ~1000, floor keeps every domain alive") {
    val rows = SparkEntry.queries("doremi_weights")(spark, Dir)
      .select("source", "excess", "weight_permille").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // floor rounding loses < 1 per-mille per source, never gains
    val total = rows.map(_._3).sum
    assert(total <= 1000 && total > 1000 - rows.length,
      s"weights sum $total outside (1000 - n, 1000]")
    rows.foreach { case (s, _, w) => assert(w >= 0, s"$s: negative weight") }
    // same excess → same weight; larger excess → no smaller weight
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((s1, e1, w1), (s2, e2, w2)) =>
        assert(w1 <= w2, s"monotonicity: $s1(excess $e1, w $w1) vs $s2(excess $e2, w $w2)")
      case _ =>
    }
  }

  test("constructed loss profiles: uniform corpus → uniform; one hard domain → upweighted") {
    val s = spark
    import s.implicits._
    // uniform: every domain at the baseline → zero excess everywhere →
    // the smoothing floor alone sets all weights equal
    val uniform = Seq(("a", 500000L), ("b", 500000L), ("c", 500000L), ("d", 500000L))
      .toDF("source", "fluency")
    val uw = TrainingMix.doremiFromFluency(uniform)
      .select("source", "excess", "weight_permille").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(uw.forall(_._2 == 0L), "uniform corpus produced non-zero excess")
    assert(uw.map(_._3).distinct.length == 1, "uniform corpus produced unequal weights")
    // one domain far below baseline takes the bulk of the mixture
    val skewed = Seq(("easy1", 900000L), ("easy2", 900000L), ("hard", 0L))
      .toDF("source", "fluency")
    val sw = TrainingMix.doremiFromFluency(skewed)
      .select("source", "weight_permille").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sw("hard") > sw("easy1") && sw("hard") > sw("easy2"),
      s"hard domain not upweighted: $sw")
    assert(sw("easy1") > 0 && sw("easy2") > 0,
      s"smoothing floor failed to keep easy domains alive: $sw")
  }
}
