package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `graft_mulge(a,b,c,d)` ⇔ `a·b ≥ c·d` must agree with exact
  * BigInt arithmetic across the full non-negative long range —
  * especially products past 2^63 and 2^126-adjacent corners — and with
  * the decimal(38,0) spelling it replaced. */
class MulGeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("agrees with BigInt on random and corner operands") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val corners = Seq(0L, 1L, 2L, (1L << 31) - 1, 1L << 31, (1L << 62) + 12345,
      Long.MaxValue, Long.MaxValue - 1)
    def rand(): Long = rng.nextLong() & Long.MaxValue
    val cases = (corners.flatMap(x => corners.map(y => (x, y, rand(), rand()))) ++
      (0 until 500).map(_ => (rand(), rand(), rand(), rand())) ++
      // equality corners: a·b == c·d exactly
      (0 until 50).map { _ =>
        val a = rng.nextInt(1 << 20).toLong; val b = rng.nextInt(1 << 20).toLong
        (a * 2, b * 3, a * 3, b * 2)
      }).toVector
    val got = cases.toDF("a", "b", "c", "d")
      .select(expr("graft_mulge(a, b, c, d)")).collect().map(_.getBoolean(0))
    cases.zip(got).foreach { case ((a, b, c, d), g) =>
      val want = BigInt(a) * BigInt(b) >= BigInt(c) * BigInt(d)
      assert(g == want, s"($a,$b,$c,$d)")
    }
  }

  test("matches the decimal(38,0) cosine-threshold spelling on the pair filter") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val maxNrm = 64L * 1000000L * 1000000L // the Semantic-family operand bound
    val rows = (0 until 300).map { _ =>
      val dot = (rng.nextDouble() * maxNrm).toLong
      val na = (rng.nextDouble() * maxNrm).toLong + 1
      val nb = (rng.nextDouble() * maxNrm).toLong + 1
      (dot, na, nb)
    }
    val df = rows.toDF("dot", "na", "nb")
    val native = df.select(expr("graft_mulge(10L * dot, 10L * dot, 9L * na, 9L * nb)"))
      .collect().map(_.getBoolean(0))
    val dec = df.select(
      (col("dot").cast("decimal(38,0)") * col("dot") * 100 >=
        lit(81).cast("decimal(38,0)") * col("na") * col("nb")))
      .collect().map(_.getBoolean(0))
    assert(native.toSeq == dec.toSeq)
  }

  test("negative operands fail loudly; nulls propagate") {
    import spark.implicits._
    val e = intercept[Exception](
      Seq((-1L, 1L, 1L, 1L)).toDF("a", "b", "c", "d")
        .select(expr("graft_mulge(a, b, c, d)")).collect())
    assert(e.getMessage != null)
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(expr("graft_mulge(a, b, 1L, 1L)")).head()
    assert(n.isNullAt(0))
  }
}
