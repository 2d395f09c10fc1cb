package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Invariants of the int8 scalar quantizer that the oracle hash alone
  * doesn't state: full coverage of the code range at the bound rows,
  * fixed width, and codes that actually discriminate. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("codes are 64 ints in [0, 255], extremes hit, vectors discriminated") {
    val rows = SparkEntry.queries("scalar_quantize_embeddings")(spark, Dir)
      .collect().map(r => r.getLong(0) -> r.getString(1).split(",").map(_.toInt))
    assert(rows.nonEmpty)
    rows.foreach { case (id, cs) =>
      assert(cs.length == 64, s"vec $id: ${cs.length} codes")
      assert(cs.forall(c => c >= 0 && c <= 255), s"vec $id: code out of range")
    }
    val all = rows.flatMap(_._2)
    // per-dimension min/max scaling must realize both ends somewhere:
    // each dimension's min row codes 0; its max row codes 255 — or 254
    // when (mx−mn)·255/(mx−mn) rounds just under 255 in IEEE double
    assert(all.min == 0 && all.max >= 254, s"range ${all.min}..${all.max}")
    // quantization at 8 bits over 64 dims must keep vectors apart
    assert(rows.map(_._2.toSeq).distinct.length == rows.length,
      "distinct embeddings collapsed to identical codes")
  }
}
