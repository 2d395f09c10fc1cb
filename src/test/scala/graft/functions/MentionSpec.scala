package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F5 mention extraction — the 11-case golden truth table ported
  * verbatim from the reference (test/firestore/test_chat.py:6-23).
  *
  * This is THE regex the DuckDB oracle cannot check (RE2 lacks the
  * lookahead; the `regexp_extract_all_mentions` oracle query runs a
  * simplified pattern by design, Scalars.scala), so the exact pattern is
  * verified here instead. The extraction is evaluated with java.util
  * .regex — the same engine Spark's `regexp_extract_all` uses, with the
  * same find-all-group-1 semantics as Python's `findall`.
  */
class MentionSpec extends AnyFunSuite {
  private val pat = java.util.regex.Pattern.compile(Fns.MentionPat)

  private def findMentions(content: String): Seq[String] = {
    val m = pat.matcher(content)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result()
  }

  private val cases: Seq[(String, Seq[String])] = Seq(
    ("@Hnr: hmmm perhaps", Seq("Hnr")),
    ("@caption oblivious: me ROPE", Seq("caption oblivious")),
    ("@Rattea um, can you speed type 4 in a row then?", Seq("Rattea")),
    ("Can someone @ me please?", Seq()),
    ("A longer and weirder @ embedded with a : later", Seq()),
    ("A longer and weirder @embedded with a : later", Seq("embedded")),
    ("Two embedded @one and later @two", Seq("one", "two")),
    ("@Rattea: &gt;:( sleep is important. you need some.", Seq("Rattea")),
    ("Embedded next to each other @one @two", Seq("one", "two")),
    ("Embedded and terminated @one: @two:", Seq("one", "two")),
    ("@coderanger: one at the start and @Ffff later", Seq("coderanger", "Ffff")),
  )

  cases.zipWithIndex.foreach { case ((content, expected), i) =>
    test(s"mention case $i: '$content'") {
      assert(findMentions(content) == expected)
    }
  }
}
