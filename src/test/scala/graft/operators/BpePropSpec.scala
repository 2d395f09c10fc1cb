package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property pinning `bpe_train_merges`' load-bearing trick: applying a
  * merge rule (a, b) as the literal string replace
  * `replace('|'-wrapped symbols, "|a||b|", "|ab|")` must equal greedy
  * left-to-right BPE merge over the symbol LIST — including the
  * adversarial cases the Scaladoc argues about (overlapping runs like
  * 'a a a', symbols that are prefixes/suffixes of one another, merged
  * symbols recombining). The per-symbol '|' wrap anchors BOTH ends of
  * both pattern symbols at boundaries; this spec is the executable
  * form of that argument (the DuckDB oracle then shows both ENGINES'
  * `replace` share these semantics). Historical note: the single-
  * separator encoding '|a|b|c' failed the random-case property here —
  * rule (aa,a) fired on ['aa','aab'] because the right symbol's END
  * was unanchored — which is why the wrap encoding exists.
  */
class BpePropSpec extends AnyFunSuite {

  /** Reference semantics: greedy left-to-right single-rule merge. The
    * merged token becomes the new "previous" symbol, so a freshly
    * merged 'ab' can itself pair with the next symbol only if the rule
    * matches the MERGED text — exactly what a resumed-after-replacement
    * string scan does. */
  private def greedyMerge(syms: List[String], a: String, b: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s
    }

  /** The query's encoding exactly: '|s|' per symbol ('||' between
    * neighbors), literal replace, decode by splitting the inner '||'. */
  private def viaReplace(syms: List[String], a: String, b: String): List[String] = {
    val joined = syms.map("|" + _ + "|").mkString
    val replaced = joined.replace("|" + a + "||" + b + "|", "|" + a + b + "|")
    replaced.substring(1, replaced.length - 1).split("\\|\\|").toList
  }

  test("literal boundary-wrapped replace == greedy list merge on 5000 random cases") {
    val rnd = new Random(20260812)
    val alphabet = Seq("a", "b", "aa", "ab", "ba", "aab", "bb", "c")
    for (i <- 1 to 5000) {
      val n = 1 + rnd.nextInt(10)
      val syms = List.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      val a = alphabet(rnd.nextInt(alphabet.size))
      val b = alphabet(rnd.nextInt(alphabet.size))
      assert(viaReplace(syms, a, b) === greedyMerge(syms, a, b),
        s"case $i: syms=$syms rule=($a,$b)")
    }
  }

  test("the documented adversarial shapes") {
    // overlapping run: greedy left-to-right, no re-merge of the result
    assert(viaReplace(List("a", "a", "a"), "a", "a") === List("aa", "a"))
    // back-to-back merges must both fire (boundary re-emitted)
    assert(viaReplace(List("a", "a", "a", "a"), "a", "a") === List("aa", "aa"))
    // prefix-confusable neighbor: (aa,a) must NOT fire on ['aa','aab']
    assert(viaReplace(List("aa", "aab"), "aa", "a") === List("aa", "aab"))
    // a rule whose right side is multi-char and prefix-shared
    assert(viaReplace(List("a", "aa"), "a", "aa") === List("aaa"))
    // symbol containing the rule's text must NOT match inside itself
    assert(viaReplace(List("aab", "b"), "a", "b") === List("aab", "b"))
  }
}
