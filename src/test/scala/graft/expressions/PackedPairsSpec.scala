package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The native `graft_pairs` kernel must emit exactly the unordered-pair
  * SET the built-in lambda spelling emits — each distinct-value pair
  * once, oriented a < b — regardless of input order, including through
  * whole-stage codegen AND the interpreted eval path (both are
  * exercised: codegen in the projection, interpreted via the
  * off-codegen explode fallback on a deliberately deep plan is not
  * forced here, so eval parity is asserted directly too). */
class PackedPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val builtin =
    "flatten(transform(ids, a -> transform(filter(ids, b -> b > a), b -> struct(a AS a, b AS b))))"

  test("pair set equals the built-in lambda spelling on random distinct inputs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // list sizes 0,1,2 (edge), then random up to 120 (past DfCap); values
    // unsorted and distinct, spanning the packed (doc_id<<22|n_sh) shape
    val rows = (0 until 60).map { g =>
      val n = if (g < 3) g else rng.nextInt(120) + 2
      val vals = rng.shuffle((0 until 4096).toList).take(n)
        .map(v => (v.toLong << 22) | (rng.nextInt(1 << 22)).toLong)
      (g.toLong, vals)
    }
    val df = rows.toDF("g", "ids").repartition(8)
    val native = df.select(col("g"), explode(expr("graft_pairs(ids)")).as("p"))
      .select(col("g"), col("p.a"), col("p.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = df.select(col("g"), explode(expr(builtin)).as("p"))
      .select(col("g"), col("p.a"), col("p.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == ref)
    // orientation + count: k(k-1)/2 pairs per group, all a < b
    val perGroup = native.groupBy(_._1).view.mapValues(_.size).toMap
    rows.foreach { case (g, vals) =>
      assert(perGroup.getOrElse(g, 0) == vals.size * (vals.size - 1) / 2, s"group $g count")
    }
    assert(native.forall { case (_, a, b) => a < b })
  }

  test("interpreted eval matches codegen output") {
    val vals = Array(5L, 1L, 9L, 3L)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vals)
    val out = PackedPairs(org.apache.spark.sql.catalyst.expressions.Literal(
        arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val pairs = (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }.toSet
    assert(pairs == Set((1L, 5L), (5L, 9L), (3L, 5L), (1L, 9L), (1L, 3L), (3L, 9L)))
  }

  test("fails loudly past the int-overflow bound instead of wrapping") {
    val big = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(46341)(0L))
    val e = intercept[IllegalArgumentException](
      PackedPairs(org.apache.spark.sql.catalyst.expressions.Literal(
        big, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null))
    assert(e.getMessage.contains("df-cap"))
  }

  test("aborts on duplicate input values instead of emitting a degenerate pair") {
    val dup = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(3L, 7L, 3L))
    val e = intercept[IllegalArgumentException](
      PackedPairs(org.apache.spark.sql.catalyst.expressions.Literal(
        dup, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null))
    assert(e.getMessage.contains("duplicate"))
    // and through codegen too
    import org.apache.spark.sql.functions._
    import graft.TestSpark
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, Seq(3L, 7L, 3L))).toDF("g", "ids")
    val e2 = intercept[Exception](df.select(expr("graft_pairs(ids)")).collect())
    assert(e2.getMessage.contains("duplicate") ||
      Option(e2.getCause).exists(_.getMessage.contains("duplicate")))
  }

  test("rejects non-array<bigint> input") {
    import spark.implicits._
    val df = Seq((1L, Seq("x", "y"))).toDF("g", "ids")
    val e = intercept[Exception](df.select(expr("graft_pairs(ids)")).collect())
    assert(e.getMessage.toLowerCase.contains("graft_pairs") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch") ||
      e.getMessage.toLowerCase.contains("cannot resolve"))
  }
}
