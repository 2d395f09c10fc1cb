package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The capped-set kernel's laws: `graft_set_cap(v, cap)` must equal
  * "sorted collect_set, or NULL when distinct count > cap" — for every
  * group, under any partitioning (merge-order independence), with the
  * boundary at EXACTLY cap distinct values kept and cap+1 overflowed.
  * The O(cap) state bound is the kernel's reason to exist; the
  * observable half of that contract is that overflow is decided by
  * DISTINCT count, not row count. */
class CappedSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def reference(rows: Seq[(Long, String)], cap: Int): Map[Long, Option[Seq[String]]] =
    rows.groupBy(_._1).view.mapValues { vs =>
      val set = vs.map(_._2).distinct
      if (set.size > cap) None else Some(set.sorted)
    }.toMap

  test("equals sorted-collect_set-or-null across partitionings and caps") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // groups engineered around the boundary: sizes 0..2·cap distinct
    // values, plus heavy duplication so row count ≫ distinct count
    val rows = (0L until 40L).flatMap { g =>
      val distinct = rnd.nextInt(13) // cap will be 6 → both sides
      (0 until distinct).flatMap { i =>
        Seq.fill(1 + rnd.nextInt(4))((g, s"v${i}_of_$g"))
      }
    }
    for (cap <- Seq(1, 6, 12); parts <- Seq(1, 7, 32)) {
      val df = spark.createDataset(rows).toDF("g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(expr(s"graft_set_cap(v, $cap)").as("s"))
        .collect()
        .map(r => r.getLong(0) ->
          Option(r.getSeq[String](1)).map(_.toSeq)).toMap
      val want = reference(rows, cap)
      assert(got == want, s"cap=$cap parts=$parts diverges from reference")
    }
  }

  test("exactly cap distinct survives; cap+1 overflows; rows ≫ distinct is irrelevant") {
    import spark.implicits._
    val atCap = (1 to 5).flatMap(i => Seq.fill(50)((1L, s"x$i")))   // 5 distinct, 250 rows
    val overCap = (1 to 6).flatMap(i => Seq.fill(50)((2L, s"y$i"))) // 6 distinct
    val df = spark.createDataset(atCap ++ overCap).toDF("g", "v").repartition(13)
    val got = df.groupBy("g").agg(expr("graft_set_cap(v, 5)").as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(got(1L).map(_.toSeq.sorted) == Some((1 to 5).map(i => s"x$i")))
    assert(got(2L).isEmpty, "cap+1 distinct values must overflow to NULL")
  }

  test("nulls ignored; all-null group yields empty array, not null") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (1L, None), (2L, Some("a")), (2L, None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(expr("graft_set_cap(v, 3)").as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1)).map(_.toSeq)).toMap
    assert(got(1L) == Some(Seq.empty), "null-only group = empty set (null MEANS overflow)")
    assert(got(2L) == Some(Seq("a")))
  }
}
