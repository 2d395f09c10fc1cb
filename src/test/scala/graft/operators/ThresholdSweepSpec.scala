package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X90 — the verify-threshold precision/recall sweep. Structural laws
  * a correct curve must satisfy (each catchable only here — the oracle
  * twin shares the arithmetic, not the semantics):
  *  - est_pos, exact_pos, tp all non-increasing in t (raising a
  *    threshold can only shrink every positive set);
  *  - tp ≤ min(est_pos, exact_pos) pointwise (it's an intersection);
  *  - at t = BandRows (= 3) the estimator accepts EVERY candidate:
  *    any LSH candidate collides on a full band, so n_agree ≥ 3 by
  *    construction — est_pos(3) must equal the candidate-pair count;
  *  - the injected near-dup pairs keep recall meaningful: exact_pos at
  *    a mid threshold must be > 0 (the corpus plants real near-dups).
  */
class ThresholdSweepSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("sweep is monotone, intersection-bounded, and band-saturated at t=3") {
    val rows = SparkEntry.queries("dedup_threshold_sweep")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1L to 12L), "one row per threshold")
    def nonIncreasing(xs: Seq[Long]) = xs.zip(xs.tail).forall { case (a, b) => a >= b }
    assert(nonIncreasing(rows.map(_._2).toSeq), "est_pos must fall with t")
    assert(nonIncreasing(rows.map(_._3).toSeq), "exact_pos must fall with t")
    assert(nonIncreasing(rows.map(_._4).toSeq), "tp must fall with t")
    rows.foreach { case (t, est, ex, tp, _, _) =>
      assert(tp <= math.min(est, ex), s"t=$t: tp $tp exceeds min($est, $ex)")
    }
    val nCandidates = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir).count()
    val est3 = rows.find(_._1 == 3L).get._2
    assert(est3 == nCandidates,
      s"band saturation violated: est_pos(3) = $est3, candidates = $nCandidates")
    assert(rows.find(_._1 == 6L).get._3 > 0,
      "no exact near-dups at J >= 1/2 — the planted dupes went missing")
  }
}
