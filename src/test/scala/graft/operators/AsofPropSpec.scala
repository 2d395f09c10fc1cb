package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style equivalence: the union+running-last as-of
  * formulation must match the brute-force definition (max right.ts ≤
  * left.ts per key, NULL when none) on arbitrary inputs — including
  * left/right timestamp ties (inclusive semantics) and keys with no
  * right rows at all. 20 seeded random timelines. */
class AsofPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of union+window == brute force on random keyed timelines") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val leftRows = (0 until (1 + rng.nextInt(30))).map(i =>
        (i.toLong, 1L + rng.nextInt(5), new Timestamp(rng.nextInt(51) * 1000L)))
      val rightRows = (0 until rng.nextInt(31)).map(_ =>
        (1L + rng.nextInt(5), new Timestamp(rng.nextInt(51) * 1000L)))
      val got = TemporalJoins.asofOf(
          leftRows.toDF("event_id", "user_id", "ts"),
          rightRows.toDF("user_id", "ts"))
        .as[(Long, Long, Timestamp, Option[Timestamp])]
        .collect().map(r => r._1 -> r._4).toMap
      val expected = leftRows.map { case (id, u, ts) =>
        val prior = rightRows.collect { case (ru, rts) if ru == u && !rts.after(ts) => rts.getTime }
        id -> (if (prior.isEmpty) None else Some(new Timestamp(prior.max)))
      }.toMap
      assert(got == expected, s"left=$leftRows right=$rightRows")
    }
  }
}
