package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `graft_winhash` must equal the built-in lambda spelling —
  * h60(concat_ws(' ', slice(words, i+1, n))) per position — bit for
  * bit, through codegen, on arbitrary token content (unicode,
  * empties, newlines) and at the length edges (shorter than n, exactly
  * n). The 60-bit digest-byte extraction must match the hex-string
  * parse exactly or every span oracle drifts. */
class WindowHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = 4
  private val builtin =
    s"transform(sequence(0, size(words) - $N), " +
      s"i -> CAST(conv(substring(md5(concat_ws(' ', slice(words, i + 1, $N))),1,15),16,10) AS BIGINT))"

  test("matches the lambda spelling on random token arrays incl. edges") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "βeta", "x", "", "line\nbreak", "tab\there", "émoji🎈", "zz9")
    val rows = (0 until 80).map { g =>
      val len = if (g < 3) g + N - 2 else rng.nextInt(40) // includes < N and == N
      (g.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).toList)
    }
    val df = rows.toDF("g", "words").repartition(5)
    val native = df.select(col("g"), expr(s"graft_winhash(words, $N)").as("h"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val ref = df.filter(size(col("words")) >= N)
      .select(col("g"), expr(builtin).as("h"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    rows.foreach { case (g, words) =>
      if (words.size >= N) assert(native(g) == ref(g), s"group $g: ${words.take(6)}")
      else assert(native(g).isEmpty, s"short array must hash to empty, group $g")
    }
  }

  test("rejects a non-literal or non-positive window size") {
    import spark.implicits._
    val df = Seq((1L, List("a", "b"))).toDF("g", "words")
    val e = intercept[Exception](df.select(expr("graft_winhash(words, 0)")).collect())
    assert(e.getMessage.toLowerCase.contains("graft_winhash") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
