package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `graft_quant` must equal the lambda spelling
  * `transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * s) AS BIGINT) + t)`
  * bit for bit on float and double inputs, including negatives, exact
  * halves, and zero. */
class QuantArraySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val S = 1000000L
  private val T = 1000000L

  test("matches the lambda spelling on random float vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val rows = (0 until 60).map { g =>
      (g.toLong, (0 until 16).map(_ => (rng.nextFloat() * 2 - 1)).toList)
    } :+ (999L, List(0f, -1f, 1f, 0.5f, -0.5f, 1e-7f, -1e-7f))
    val df = rows.toDF("g", "v").repartition(4)
    val native = df.select(col("g"), expr(s"graft_quant(v, ${S}L, ${T}L)").as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val ref = df.select(col("g"), expr(
      s"transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * $S) AS BIGINT) + $T)").as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    assert(native == ref)
  }

  test("double input and null array") {
    import spark.implicits._
    val df = Seq((1L, List(0.25, -0.75)), (2L, null.asInstanceOf[List[Double]]))
      .toDF("g", "v")
    val got = df.select(col("g"), expr(s"graft_quant(v, ${S}L, 0L)").as("q"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Long](1).toList))
      .toMap
    assert(got(1L) == List(250000L, -750000L))
    assert(got(2L) == null)
  }
}
