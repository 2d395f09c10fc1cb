package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Kernel law for `graft_looprun`: equals the from-scratch definition
  * — max m such that some n-gram repeats m times back to back — on
  * random token arrays, plus the documented edge returns (0 windows,
  * single window, whole-array loop). */
class LoopRunSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    graft.SparkEntry.ensure(s) // the kernel registry (suite-order-independent)
    s
  }

  /** Definition-level brute force on STRINGS (no hashes): for every
    * start i and window n, count how many times words[i, i+n) repeats
    * back to back. */
  private def brute(words: Seq[String], n: Int): Long = {
    val m = words.length - n + 1
    if (m <= 0) return 0L
    var best = 1L
    for (i <- 0 until m) {
      val g = words.slice(i, i + n)
      var reps = 1L
      var j = i + n
      while (j + n <= words.length && words.slice(j, j + n) == g) {
        reps += 1; j += n
      }
      if (reps > best) best = reps
    }
    best
  }

  private def kernel(words: Seq[String], n: Int): Long = {
    import spark.implicits._
    Seq(words).toDF("w")
      .selectExpr(s"graft_looprun(w, $n)").collect().head.getLong(0)
  }

  test("property: kernel equals the string-level brute force on random arrays") {
    // tiny alphabet so consecutive repeats actually occur; one Spark
    // round-trip for all cases (collect per case would dominate)
    val rng = new scala.util.Random(19)
    val cases = (1 to 120).map { _ =>
      val n = 1 + rng.nextInt(4)
      val len = rng.nextInt(41)
      (Seq.fill(len)(Seq("a", "b", "c")(rng.nextInt(3))), n)
    }
    import spark.implicits._
    cases.groupBy(_._2).foreach { case (n, cs) =>
      val got = cs.map(_._1).toDF("w")
        .selectExpr(s"graft_looprun(w, $n)").collect().map(_.getLong(0)).toSeq
      val want = cs.map(c => brute(c._1, n))
      assert(got == want, s"n=$n")
    }
  }

  test("edges: no window -> 0, single window -> 1, pure loop -> count") {
    assert(kernel(Seq("a", "b"), 3) == 0L)
    assert(kernel(Seq("a", "b", "c"), 3) == 1L)
    assert(kernel(Seq.fill(5)(Seq("x", "y", "z")).flatten, 3) == 5L)
    // overlapping self-similar text: "a a a a" with n=2 repeats the
    // gram (a a) twice back to back (positions 0 and 2)
    assert(kernel(Seq("a", "a", "a", "a"), 2) == 2L)
  }
}
