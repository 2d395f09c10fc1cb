package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** X79/X80 — the character-diversity gate and the domain-concentration
  * report. The gate's histogram invariants and branch laws are checked
  * on the harness corpus AND on crafted degenerate docs (the corpus is
  * natural text, so its rows all pass — the failing branches need
  * adversarial input to prove they fire); the Gini report is
  * cross-checked against the independent mean-absolute-difference
  * formula and the uniform-corpus zero law.
  */
class CharGiniSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("char_diversity_gate: histogram invariants hold row by row") {
    val rows = SparkEntry.queries("char_diversity_gate")(spark, Dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, covered, distinct, top, sumSq) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(covered == n, s"doc ${r.getLong(0)}: alphabet must cover the corpus " +
        s"($covered of $n chars)")
      assert(distinct >= 1 && distinct <= 37)
      assert(top >= (n + distinct - 1) / distinct && top <= n,
        s"modal count $top outside [$n/$distinct, $n]")
      // Cauchy–Schwarz floor and the modal-mass ceiling
      assert(sumSq >= n * n / distinct && sumSq <= top * n,
        s"sum_sq $sumSq outside [n²/distinct, top·n]")
      val expected =
        if (sumSq * 5 > n * n) "concentrated"
        else if (distinct < 8) "narrow"
        else "ok"
      assert(r.getString(7) == expected, s"gate law violated on doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(6) - sumSq.toDouble / (n * n)) == 0.0)
    }
    // natural text is diverse: the corpus itself passes the gate
    assert(rows.forall(_.getString(7) == "ok"))
  }

  test("char_diversity_gate: degenerate docs trip each failing branch") {
    import spark.implicits._
    val crafted = Seq(
      0L -> ("a" * 40),                    // one char: concentrated
      1L -> ("abcdefg" * 10),              // 7 distinct, even: narrow (not concentrated)
      2L -> "the quick brown fox jumps over 12 lazy dogs",  // diverse: ok
      3L -> "",                            // empty: filtered out entirely
    ).toDF("doc_id", "text")
    val out = Curation.charDiversityCore(crafted)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(out(0).getString(7) == "concentrated")
    assert(out(1).getString(7) == "narrow")
    assert(out(2).getString(7) == "ok")
  }

  test("char_diversity_gate: plan is one scan-side projection — no join, " +
    "no aggregate exchange") {
    val df = SparkEntry.queries("char_diversity_gate")(spark, Dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"gate must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"gate must not aggregate:\n$plan")
    // the only exchange allowed is the output ordering's range partition
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"histogramming must stay row-local:\n$plan")
  }

  test("domain_token_gini: Lorenz curve is coherent and Gini matches the " +
    "independent mean-absolute-difference formula") {
    val rows = SparkEntry.queries("domain_token_gini")(spark, Dir).collect()
    val n = rows.length
    assert(n >= 2)
    assert(rows.map(_.getLong(3)).toSeq == (1L to n).toSeq, "rank_asc must be 1..n")
    val tokens = rows.map(_.getLong(2))
    assert(tokens.sameElements(tokens.sorted), "rows must ascend by mass")
    val shares = rows.map(_.getLong(5))
    assert(shares.sameElements(shares.sorted), "cumulative share must be monotone")
    assert(shares.last == 1000L, "the Lorenz curve must end at 1000‰")
    val cum = rows.map(_.getLong(4))
    assert(cum.last == tokens.sum, "last cumulative mass must be the total")
    // independent recompute: G = Σᵢⱼ|mᵢ−mⱼ| / (2·n·T)
    val total = tokens.sum
    val mad = (for (a <- tokens; b <- tokens) yield math.abs(a - b)).sum
    val direct = (1000L * mad) / (2L * n * total)
    val reported = rows.head.getLong(6)
    assert(rows.forall(_.getLong(6) == reported), "gini must be constant across rows")
    assert(math.abs(reported - direct) <= 1,
      s"rank-formula gini $reported vs MAD gini $direct")
  }

  test("domain_token_gini: a uniform corpus reports (near-)zero Gini") {
    import spark.implicits._
    val uniform = (0 until 40).map(i => (s"s${i % 4}", "tok " * 25 + "end"))
      .toDF("source", "text")
    val out = Curation.domainTokenGiniCore(uniform).collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(6) == 0L), "equal masses must score Gini 0")
  }
}
