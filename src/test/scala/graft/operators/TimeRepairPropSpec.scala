package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style equivalence: for ANY page of time-of-day strings, the
  * windowed `monotonicRepair` equals the reference's sequential walk
  * (scrapers/chat.py:36-51, re-implemented literally below). The golden
  * fixture (TimeRepairSpec) proves one real cascade; this proves the
  * formulation over 20 seeded random pages including adversarial
  * many-rollover shapes. */
class TimeRepairPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Literal port of the reference loop: walk newest→oldest, anchored to
    * the previous repaired row (seeded with "now"); a time-of-day that
    * increases while walking backwards crossed midnight → one more day
    * back. Returns cumulative day offsets in document order. */
  private def sequentialOffsets(tods: Seq[String], nowTod: String): Seq[Int] = {
    var lastTod = nowTod
    var offset = 0
    tods.map { tod =>
      if (tod > lastTod) offset += 1
      lastTod = tod
      offset
    }
  }

  test("windowed repair == sequential reference walk on 20 random pages") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // deterministic
    def tod() = f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
    (1 to 20).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val tods = Seq.fill(n)(tod())
      val nowTod = tod()
      val df = tods.zipWithIndex
        .map { case (t, i) => (1L, (n - i).toLong, t) }
        .toDF("page", "doc_order", "tod")
      val got = TimeRepair
        .monotonicRepair(df, "page", "doc_order", "tod", "2024-01-15", nowTod)
        .orderBy(org.apache.spark.sql.functions.col("doc_order").desc)
        .select("days_back").as[Int].collect().toSeq
      assert(got == sequentialOffsets(tods, nowTod), s"trial $trial, now=$nowTod, tods=$tods")
    }
  }
}
