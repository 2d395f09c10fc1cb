package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The fused `graft_simhash` aggregate must be bit-identical to the
  * unfused column-algebra form (n separate sum-of-±1 aggregates packed
  * by sign) — the form the DuckDB oracle runs — including through
  * partial aggregation and buffer serde across many partitions. */
class SimHashVotesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unfused(df: org.apache.spark.sql.DataFrame, bits: Int) = {
    val votes = (0 until bits).map(j =>
      sum(when(expr(s"(wh >> $j) & 1") === 1, 1).otherwise(-1)).as(s"v$j"))
    val packed = (0 until bits)
      .map(j => when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    df.groupBy("g").agg(votes.head, votes.tail: _*)
      .select(col("g"), packed.as("fp"))
  }

  test("fused == unfused on adversarial hashes, across partitions (forces partial merge + serde)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // keys with 1..200 rows; hashes cover 0, all-ones-60, single bits, random
    val rows = (0 until 50).flatMap { g =>
      val special = Seq(0L, (1L << 60) - 1, 1L, 1L << 59)
      val rand = Seq.fill(rng.nextInt(200))(rng.nextLong() & ((1L << 60) - 1))
      (special ++ rand).map(h => (g.toLong, h))
    }
    val df = rows.toDF("g", "wh").repartition(16) // partials merge across 16 partitions
    Seq(1, 16, 60).foreach { bits =>
      val fused = df.groupBy("g").agg(expr(s"graft_simhash(wh, $bits)").as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = unfused(df, bits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fused == ref, s"fused/unfused diverge at bits=$bits")
    }
  }

  test("rejects bad arguments") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("g", "wh")
    val e = intercept[Exception] {
      df.groupBy("g").agg(expr("graft_simhash(wh, 61)")).collect()
    }
    assert(e.getMessage.contains("[1, 60]"))
  }
}
