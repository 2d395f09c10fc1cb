package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `graft_minhash` must equal the built-in k × array_min(transform(...))
  * spelling — the same universal-hash arithmetic the DuckDB oracle SQL
  * interpolates — bit for bit, through codegen, on arbitrary 60-bit
  * hash arrays, and must yield NULL on an empty input exactly like
  * array_min does. */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val P = MinHashSig.MersenneP
  private val K = 12

  test("matches the array_min(transform) spelling on random hash arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (0 until 60).map { g =>
      val len = rng.nextInt(50) + 1
      // 60-bit values, like WindowHash emits
      (g.toLong, (0 until len).map(_ => rng.nextLong().abs & ((1L << 60) - 1)).toList)
    }
    val df = rows.toDF("g", "hs").repartition(4)
    val native = df.select(col("g"), expr(s"graft_minhash(hs, $K)").as("m"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val refCols = (0 until K).map(s =>
      expr(s"array_min(transform(hs, h -> ((h % $P) * ${MinHashSig.hashA(s)}" +
        s" + ${MinHashSig.hashB(s)}) % $P))").as(s"m$s"))
    val ref = df.select(col("g") +: refCols: _*)
      .collect().map(r => (r.getLong(0), (1 to K).map(r.getLong(_)).toList)).toMap
    rows.foreach { case (g, _) => assert(native(g) == ref(g), s"group $g") }
  }

  test("empty input is NULL, like array_min; null array propagates") {
    import spark.implicits._
    val df = Seq((1L, List.empty[Long]), (2L, List(5L)),
      (3L, null.asInstanceOf[List[Long]])).toDF("g", "hs")
    val out = df.select(col("g"), expr(s"graft_minhash(hs, 2)").as("m"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(out(1L), "empty array must yield null signature")
    assert(!out(2L))
    assert(out(3L), "null input must yield null")
  }

  test("rejects a non-literal or out-of-range k") {
    import spark.implicits._
    val df = Seq((1L, List(1L, 2L))).toDF("g", "hs")
    val e = intercept[Exception](df.select(expr("graft_minhash(hs, 0)")).collect())
    assert(e.getMessage.toLowerCase.contains("graft_minhash") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
