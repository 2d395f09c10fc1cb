package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Parity pins for [[InterSortedCount]] (`graft_inter_sorted`): on
  * SORTED inputs it must equal `size(array_intersect(a, b))`
  * exactly — random multisets for both element types (duplicates
  * included, so the dup-skip arms of the merge are exercised), the
  * codegen AND interpreted paths, plus the structural edges (empty,
  * disjoint, identical, all-duplicates, null array) and the analysis
  * rejections (type mismatch). One seeded Random, one Spark round-trip
  * per batch — the repo's property-test shape. */
class InterSortedCountSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def runBoth(df: org.apache.spark.sql.DataFrame): Unit = {
    val out = df
      .withColumn("kernel", expr("graft_inter_sorted(a, b)"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("kernel")) == r.getLong(r.fieldIndex("builtin")),
        s"kernel diverged from array_intersect: $r")
    }
    assert(out.nonEmpty)
  }

  test("random sorted long multisets equal size(array_intersect) — 200 pairs") {
    import spark.implicits._
    val rnd = new Random(42)
    // small value domain forces collisions AND duplicates
    def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(25).toLong).sorted
    val rows = Seq.fill(200)((arr(), arr()))
    runBoth(rows.toDF("a", "b"))
  }

  test("random sorted string multisets equal size(array_intersect) — 200 pairs") {
    import spark.implicits._
    val rnd = new Random(43)
    val vocab = Vector("a", "ab", "abc", "b", "ba", "z", "zz", "é", "平", "0", "00")
    def arr() = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      .sortBy(s => s.getBytes("UTF-8").map(_ & 0xff).toSeq.mkString(","))
    // sort_array in-engine instead of trusting the JVM-side ordering:
    // the contract is Spark's own sort order
    val df = Seq.fill(200)((arr(), arr())).toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    runBoth(df)
  }

  test("structural edges: empty, disjoint, identical, all-duplicate, null") {
    import spark.implicits._
    val cases = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(7L, 7L, 7L), Seq(7L, 7L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    runBoth(cases.toDF("a", "b"))
    // null array -> null result (BinaryExpression null contract)
    val n = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .selectExpr("graft_inter_sorted(a, b)").collect()
    assert(n.head.isNullAt(0))
    // null ELEMENTS sort first and follow array_intersect's
    // null-matches-null set semantics — pinned via sort_array
    val withNulls = Seq(
      (Seq[Option[Long]](None, Some(1L), Some(2L)), Seq[Option[Long]](None, Some(2L))),
      (Seq[Option[Long]](None, None, Some(3L)), Seq[Option[Long]](Some(3L))),
      (Seq[Option[Long]](None), Seq[Option[Long]](None))).toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    runBoth(withNulls)
  }

  test("interpreted fallback agrees with codegen") {
    // evaluate the expression directly (interpreted eval path)
    val e = InterSortedCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 2L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 5L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)))
    assert(e.eval(null) == 2L)
  }

  test("analysis rejects mixed or non-array types with a pointed message") {
    import spark.implicits._
    val df = Seq((Seq(1L), Seq("x"))).toDF("a", "b")
    val err = intercept[Exception] {
      df.selectExpr("graft_inter_sorted(a, b)").collect()
    }
    assert(err.getMessage.contains("graft_inter_sorted"))
  }
}
