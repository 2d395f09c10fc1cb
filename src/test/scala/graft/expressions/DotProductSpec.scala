package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** graft_dot must be BIT-identical to the built-in fold it replaces —
  * the oracle hash-compare tolerates zero ulps of drift. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot == aggregate(zip_with(...)) bit-for-bit, codegen path") {
    import spark.implicits._
    val df = Seq.tabulate(100) { k =>
      (Seq.tabulate(64)(i => math.sin(k * 64 + i)),
        Seq.tabulate(64)(i => math.cos(k * 64 + i)))
    }.toDF("a", "b")
    val rows = df.select(
        expr("graft_dot(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("builtin"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, b) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(b))
    }
  }

  test("null array -> null; empty arrays -> 0.0") {
    import spark.implicits._
    val got = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1D)) AS n, " +
        "graft_dot(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS e")
      .selectExpr("n IS NULL AS n_null", "e").as[(Boolean, Double)].collect().head
    assert(got == ((true, 0.0)))
  }
}
