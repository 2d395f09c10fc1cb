package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Bloom sizing law (docs/SCALE.md): m = n·ln(1/p)/ln²2 rounded to
  * the next power of two. The oracle bit pattern depends on the
  * instantiated size, so the sf0.01 design point must keep resolving to
  * the historical 1024-bit constant.
  */
class SketchesSpec extends AnyFunSuite {

  test("sf0.01 design point resolves to the bit-exact oracle constant") {
    assert(Sketches.sizeBits(141L, 0.08) === 1024)
  }

  test("size is a power of two and at least one lane") {
    for (n <- Seq(1L, 10L, 141L, 10000L, 1000000000L); p <- Seq(0.5, 0.08, 0.01)) {
      val m = Sketches.sizeBits(n, p)
      assert(m >= 32, s"n=$n p=$p")
      assert(java.lang.Long.bitCount(m) === 1, s"n=$n p=$p m=$m not a power of two")
    }
  }

  test("size grows with the seen-set and with tighter fp targets") {
    assert(Sketches.sizeBits(1000000L, 0.01) === (1L << 24)) // ~9.6 Mbit → 16 Mbit
    // the SCALE.md design point: 10⁹ keys at 1% must NOT fold back to
    // the 32-bit floor (the Int-saturation bug this pins against)
    assert(Sketches.sizeBits(1000000000L, 0.01) === (1L << 34)) // ~9.6 Gbit → 16 Gbit
    for (n <- Seq(100L, 10000L, 1000000L)) {
      assert(Sketches.sizeBits(n * 10, 0.01) >= Sketches.sizeBits(n, 0.01))
      assert(Sketches.sizeBits(n, 0.001) >= Sketches.sizeBits(n, 0.01))
    }
  }

  test("degenerate inputs fail loudly instead of returning the floor") {
    intercept[IllegalArgumentException](Sketches.sizeBits(0L, 0.01))
    intercept[IllegalArgumentException](Sketches.sizeBits(-5L, 0.01))
    intercept[IllegalArgumentException](Sketches.sizeBits(100L, 1.0))
    intercept[IllegalArgumentException](Sketches.sizeBits(100L, 0.0))
    intercept[IllegalArgumentException](Sketches.sizeBits(Long.MaxValue / 2, 1e-300))
  }

  // -------------------------------------------------------------------
  // sketch guarantee laws on the sf0.001 corpus (graft.TestSpark session)
  // -------------------------------------------------------------------

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("cms_heavy_hitters only ever over-estimates, and never misses a true heavy hitter") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.cmsHeavyHitters(spark, dir).collect()
    assert(rows.nonEmpty)
    // CMS guarantee: estimate >= exact, always
    rows.foreach(r =>
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("exact_count"), r.toString))
    // no false negatives: every term at/above the phi threshold is reported
    val tok = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val total = tok.count()
    val trueHeavy = tok.groupBy("term").count()
      .filter(col("count") >= total / 200).select("term")
      .collect().map(_.getString(0)).toSet
    val reported = rows.map(_.getAs[String]("term")).toSet
    assert(trueHeavy.subsetOf(reported),
      s"missing heavy hitters: ${trueHeavy -- reported}")
  }

  test("hll_distinct raw estimate lands within the m=16 error envelope") {
    val rows = Sketches.hllDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Long]("n_hll").toDouble
      // 1.04/sqrt(16) = 26% standard error; allow 4 sigma plus the
      // small-n bias floor (sf0.001 groups hold only a handful of docs,
      // where the uncorrected raw estimate reads high — see Scaladoc)
      assert(est > 0 && est < math.max(exact * 3.0, 60.0),
        s"source=${r.getString(0)} exact=$exact est=$est")
    }
  }

  test("hll registers merge associatively: union estimate == merged-register estimate") {
    // the property that makes the sketch cluster-mergeable: computing
    // registers over A∪B equals max-merging registers computed over A
    // and B separately. Verified on raw h60 register math in Scala.
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def regs(xs: Seq[String]): Map[Long, Int] =
      xs.groupBy(x => h60(x) % 16).view.mapValues(_.map { x =>
        val rest = h60(x) / 16
        if (rest == 0) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      }.max).toMap
    val a = (1 to 200).map(i => s"key$i")
    val b = (150 to 400).map(i => s"key$i")
    val merged = (regs(a).keySet ++ regs(b).keySet).map(k =>
      k -> math.max(regs(a).getOrElse(k, 0), regs(b).getOrElse(k, 0))).toMap
    assert(merged === regs(a ++ b))
  }
}
