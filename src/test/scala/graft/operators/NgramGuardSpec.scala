package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The dedup family's candidate-volume tripwires (`observe` metrics —
  * VERDICT r9 "What's missing" #3): the df-cap bounds per-shingle
  * fanout by construction, but nothing at runtime SHOWED the realized
  * candidate volume — a boilerplate-heavy corpus can degrade inside
  * the proven envelope. These specs pin (a) that the metrics actually
  * surface from a normal run with no extra jobs, and (b) the provable
  * invariant candidate_pairs ≤ kept_rows·(DfCap−1)/2. */
class NgramGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("ngram candidate volume is observed and obeys the df-cap envelope") {
    val df = SparkEntry.queries("ngram_jaccard_pairs")(spark, Dir)
    df.collect()
    val ms = df.queryExecution.observedMetrics
    assert(ms.contains("graft_ngram_kept") && ms.contains("graft_ngram_pairs"),
      s"tripwire metrics missing from run: ${ms.keys}")
    val kept = ms("graft_ngram_kept").getAs[Long]("kept_rows")
    val pairs = ms("graft_ngram_pairs").getAs[Long]("candidate_pairs")
    assert(kept > 0, "df-capped shingle relation must be non-empty on the harness corpus")
    assert(pairs > 0, "candidate enumeration must fire (no vacuous green)")
    val bound = kept * (Dedup.DfCap - 1L) / 2L
    assert(pairs <= bound,
      s"candidate pairs $pairs exceed the df-cap envelope $bound (kept=$kept)")
  }

  test("minhash estimator: every LSH candidate agrees on ≥ BandRows hashes") {
    // structural pigeonhole: a candidate collides on at least one full
    // band of 3 consecutive minhashes, so n_agree ≥ 3 by construction —
    // an estimator row below that would mean banding or the agreement
    // sum is broken
    val out = SparkEntry.queries("minhash_jaccard_estimate")(spark, Dir).collect()
    assert(out.nonEmpty, "the near-dup corpus must produce candidate pairs")
    out.foreach { r =>
      assert(r.getLong(2) >= 3,
        s"pair (${r.getLong(0)},${r.getLong(1)}): n_agree=${r.getLong(2)} < band width")
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 12.0) == 0.0, "estimate must be n_agree/12")
    }
  }

  test("minhash pre-distinct candidate volume is observed and ~linear in docs") {
    val df = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir)
    df.collect()
    val ms = df.queryExecution.observedMetrics
    assert(ms.contains("graft_minhash_candidates"),
      s"tripwire metric missing from run: ${ms.keys}")
    val pairs = ms("graft_minhash_candidates").getAs[Long]("candidate_pairs")
    val docs = graft.Tables.documents(spark, Dir).count() * 2 // + near-dup re-crawl band
    assert(pairs > 0, "band join must produce candidates on the near-dup corpus")
    // each doc pairs with its re-crawl twin across ≤4 bands plus noise
    // collisions; an order-of-magnitude headroom still catches bucket
    // collapse (all docs hashing into one band value would be ~docs²/8)
    assert(pairs <= 20L * docs,
      s"minhash candidates $pairs vs $docs docs — bucket collapse / band degeneration?")
  }
}
