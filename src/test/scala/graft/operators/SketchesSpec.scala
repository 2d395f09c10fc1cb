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
}
