package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Parity + invariance pins for the native BPE train aggregate
  * ([[BpeTrain]]), mirroring BpePropSpec's role for the encode framing:
  *   1. the kernel's train loop equals an independently-written naive
  *      reference (full pair recount + argmax + greedy list fold per
  *      round, UTF-8-byte tie-break) on random corpora;
  *   2. the Spark aggregate is invariant under input partitioning
  *      (partial/merge order must not leak into the result);
  *   3. tie-breaks compare code points (= UTF-8 byte order), not Java's
  *      UTF-16 code units — pinned on a supplementary-plane case;
  *   4. a corpus that exhausts its pairs stops early, mirroring the
  *      declarative spelling whose empty argmax emitted no more rows.
  */
class BpeAggSpec extends AnyFunSuite {

  /** The engines' string ORDER BY contract, written independently of
    * the kernel's code-point compare: UTF-8 byte order. */
  private val byUtf8: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes("UTF-8")
      val b = y.getBytes("UTF-8")
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(a.length, b.length)
    }
  }

  /** Naive reference: recount-everything-per-round greedy BPE over a
    * (word → freq) map. Deliberately list-based — a different shape
    * from the kernel's loop. */
  private def naiveTrain(
      vocab: Map[String, Long], rounds: Int): List[(String, String, Long)] = {
    def fold(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    var entries = vocab.toList.map { case (w, f) =>
      (w.codePoints().toArray.toList.map(Character.toString), f)
    }
    var out = List.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = entries.flatMap { case (syms, f) =>
        syms.zip(syms.drop(1)).map(p => (p, f))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val (a, b, pf) = counts.toList.map { case ((a, b), pf) => (a, b, pf) }
          .min(Ordering.by[(String, String, Long), Long](-_._3)
            .orElseBy(_._1)(byUtf8).orElseBy(_._2)(byUtf8))
        out :+= ((a, b, pf))
        entries = entries.map { case (syms, f) => (fold(syms, a, b), f) }
        r += 1
      }
    }
    out
  }

  test("kernel train loop == naive reference on 300 random corpora") {
    val rnd = new Random(20260813)
    val alphabet = "ab"
    for (i <- 1 to 300) {
      val nWords = 1 + rnd.nextInt(8)
      val vocab = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(5)
        (List.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          1L + rnd.nextInt(4))
      }.toMap // map: duplicate words collapse, like the word-count agg
      val rounds = 1 + rnd.nextInt(4)
      val got = BpeTrain.train(vocab.iterator, rounds).toList
      val want = naiveTrain(vocab, rounds)
      assert(got === want, s"case $i: vocab=$vocab rounds=$rounds")
    }
  }

  test("aggregate result is invariant under input partitioning") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "a cat and a dog", "mats and logs and cats").toDF("text")
    def rules(parts: Int): Seq[org.apache.spark.sql.Row] = docs.repartition(parts)
      .select(split(col("text"), " ").as("toks"))
      .agg(expr("graft_bpe_train(toks, 4)").as("r"))
      .select(explode(col("r"))).collect().toSeq
    val one = rules(1)
    assert(one.nonEmpty && one === rules(7))
  }

  test("tie-break is code-point order, not UTF-16 code-unit order") {
    // U+1F600 (surrogate pair, UTF-16 units d83d de00) vs U+FFFD: Java
    // String order puts the surrogate FIRST; code-point/UTF-8 order
    // puts it LAST. Both words have freq 1 and one pair each, so the
    // round-0 winner is decided purely by the 'a' tie-break.
    val hi = new String(Character.toChars(0x1F600))
    val lo = "�"
    assert(hi.compareTo(lo) < 0, "precondition: UTF-16 order differs")
    assert(BpeTrain.cpCompare(hi, lo) > 0 && byUtf8.compare(hi, lo) > 0)
    val vocab = Map(hi + "x" -> 1L, lo + "x" -> 1L)
    val got = BpeTrain.train(vocab.iterator, 1)
    assert(got.head._1 === lo, s"lower code point must win the tie: ${got.toList}")
  }

  test("pair exhaustion stops the train early (declarative empty-argmax parity)") {
    val got = BpeTrain.train(Iterator(("ab", 3L)), 5)
    assert(got.toList === List(("a", "b", 3L)),
      "one fusable pair → one rule, then stop")
    assert(BpeTrain.train(Iterator(("x", 9L)), 5).isEmpty,
      "single-symbol words never pair")
  }
}
