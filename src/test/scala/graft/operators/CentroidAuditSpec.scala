package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X91 — the label-centroid coherence audit. Pins the report's
  * diagnostic value on this corpus:
  *  - the injected coherent class (999, exact copies of vector 0)
  *    must read coherence = 1000 (every member IS the centroid
  *    direction) and a decisively positive margin;
  *  - the organic classes carry RANDOM labels, so their margins must
  *    sit near zero (the honest verdict, same convention as
  *    knn_label_eval) — strictly below the injected class's;
  *  - membership counts must match the raw label histogram.
  */
class CentroidAuditSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("injected class is coherent; random classes are not") {
    val rows = SparkEntry.queries("label_centroid_audit")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val inj = rows.find(_._1 == 999L).getOrElse(fail("injected class missing"))
    assert(inj._2 == 16L, s"injected class size: ${inj._2}")
    // the centroid is quantized to 10^-6 before the cosine and the
    // per-row permille is floored, so an exactly coherent class reads
    // 999 or 1000 — at most one permille below the ideal
    assert(inj._3 >= 999L, s"injected coherence: ${inj._3}")
    assert(inj._5 > 500L, s"injected margin must be decisive: ${inj._5}")
    val organic = rows.filter(_._1 != 999L)
    assert(organic.nonEmpty)
    organic.foreach { case (l, _, _, _, margin) =>
      assert(math.abs(margin) < 300,
        s"random-label class $l shows margin $margin — labels aren't random?")
      assert(margin < inj._5, s"class $l margin not below the injected class")
    }
    val hist = graft.Tables.embeddings(spark, Dir)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    organic.foreach { case (l, n, _, _, _) =>
      assert(hist(l) == n, s"class $l count $n != histogram ${hist(l)}")
    }
  }
}
