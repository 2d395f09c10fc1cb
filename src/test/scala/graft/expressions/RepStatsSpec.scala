package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `graft_repstats` must equal the column-algebra spelling it replaced
  * (the r12 repetition_score internals): longest run in the sorted
  * token array, bigram count, distinct-bigram count under CONCAT
  * equality — bit for bit, through codegen, on arbitrary token content
  * including repeats, unicode, and empties. */
class RepStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val builtinTop =
    """CAST(aggregate(array_sort(words),
      |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
      |  (acc, w) -> named_struct(
      |    'prev', w,
      |    'run',  IF(w <=> acc.prev, acc.run + 1L, 1L),
      |    'best', GREATEST(acc.best, IF(w <=> acc.prev, acc.run + 1L, 1L))),
      |  acc -> acc.best) AS BIGINT)""".stripMargin
  private val builtinBigrams =
    "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i + 1]))"

  test("matches the lambda spelling on random repetitive token arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    // small vocab → real repeats and duplicate bigrams
    val vocab = Vector("the", "the", "cat", "sat", "ȷoy", "", "x")
    val rows = (0 until 120).map { g =>
      val len = 2 + rng.nextInt(60)
      (g.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).toList)
    }
    val df = rows.toDF("g", "words").repartition(5)
    val native = df.select(col("g"), expr("graft_repstats(words)").as("rs"))
      .select(col("g"), col("rs.top_term_n"), col("rs.n_bigrams"),
        col("rs.n_distinct_bigrams"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ref = df
      .withColumn("top", expr(builtinTop))
      .withColumn("bg", expr(builtinBigrams))
      .select(col("g"), col("top"), size(col("bg")).cast("long").as("nb"),
        size(array_distinct(col("bg"))).cast("long").as("ndb"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { case (g, words) =>
      assert(native(g) == ref(g), s"group $g: ${words.take(8)}")
    }
  }

  test("bigram identity is concat equality, exactly like the concat spelling") {
    import spark.implicits._
    // ("a b","c") and ("a","b c") concat to the same bigram "a b c" —
    // the kernel must agree with the concat spelling, not tuple identity
    val df = Seq((1L, List("a b", "c", "a", "b c"))).toDF("g", "words")
    val r = df.select(expr("graft_repstats(words)").as("rs"))
      .select(col("rs.n_bigrams"), col("rs.n_distinct_bigrams")).head()
    assert(r.getLong(0) == 3L)
    // bigrams: "a b c", "c a", "a b c" → 2 distinct under concat equality
    assert(r.getLong(1) == 2L)
  }

  test("single-token and null handling") {
    import spark.implicits._
    val r = Seq((1L, List("only"))).toDF("g", "words")
      .select(expr("graft_repstats(words)").as("rs"))
      .select(col("rs.top_term_n"), col("rs.n_bigrams"), col("rs.n_distinct_bigrams"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 0L, 0L)))
    val nullArr = Seq((1L, null.asInstanceOf[List[String]])).toDF("g", "words")
      .select(expr("graft_repstats(words)").as("rs")).head()
    assert(nullArr.isNullAt(0))
    val e = intercept[Exception](
      Seq((1L, List("a", null.asInstanceOf[String]))).toDF("g", "words")
        .select(expr("graft_repstats(words)")).collect())
    assert(e.getMessage != null)
  }
}
