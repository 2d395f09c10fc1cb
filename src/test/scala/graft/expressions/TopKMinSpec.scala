package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style equivalence for the bounded MIN-top-k aggregate: on
  * random grouped inputs — duplicate keys (tie-break territory), k
  * larger than the group, nulls in either column, adversarial
  * partition counts — `graft_topk_min(key, id, k)` must equal the
  * brute-force "sort by (key ASC, id ASC), take k" reference, in
  * order. Repartitioning the same input 1/3/32 ways exercises the
  * partial-merge path: a heap whose eviction diverged from the total
  * order would produce partitioning-dependent winners. */
class TopKMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(rows: Seq[(String, Long, Long)], k: Int): Map[String, Seq[(Long, Long)]] =
    rows.groupBy(_._1).view.mapValues { g =>
      g.map(t => (t._2, t._3)).sorted.take(k)
    }.toMap

  test("graft_topk_min == sort-and-take on random groups across partitionings") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "g STRING, key BIGINT, id BIGINT")
    val rng = new scala.util.Random(163)
    (1 to 12).foreach { trial =>
      val k = 1 + rng.nextInt(9)
      val nGroups = 1 + rng.nextInt(5)
      // duplicate keys on purpose: the (key ASC, id ASC) tie-break is
      // where a sloppy heap ordering breaks first; ids distinct per
      // group (they are row identities in every registered use)
      val rows = (0 until 30 + rng.nextInt(200)).map { i =>
        (s"g${rng.nextInt(nGroups)}", (rng.nextInt(6)).toLong, i.toLong)
      }
      val expected = brute(rows, k)
      Seq(1, 3, 32).foreach { parts =>
        val got = spark.createDataFrame(
          rows.map { case (g, key, id) => Row(g, key, id) }.asJava, schema)
          .repartition(parts)
          .groupBy("g").agg(expr(s"graft_topk_min(key, id, $k)").as("top"))
          .collect()
          .map { r =>
            r.getString(0) -> r.getSeq[Row](1).map(s => (s.getLong(0), s.getLong(1)))
          }.toMap
        assert(got == expected,
          s"trial $trial parts $parts k $k: $got vs $expected")
      }
    }
  }

  test("double keys: heap == sort-and-take, and -0.0 ties with +0.0") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "g STRING, key DOUBLE, id BIGINT")
    val rng = new scala.util.Random(271)
    (1 to 8).foreach { trial =>
      val k = 1 + rng.nextInt(5)
      val rows = (0 until 50 + rng.nextInt(100)).map { i =>
        // mixed signs + exact duplicates (tie territory)
        (s"g${rng.nextInt(3)}", (rng.nextInt(9) - 4) / 4.0, i.toLong)
      }
      val expected = rows.groupBy(_._1).view.mapValues { g =>
        g.map(t => (t._2, t._3)).sortBy(p => (p._1, p._2)).take(k)
      }.toMap
      Seq(1, 32).foreach { parts =>
        val got = spark.createDataFrame(
          rows.map { case (g, key, id) => Row(g, key, id) }.asJava, schema)
          .repartition(parts)
          .groupBy("g").agg(expr(s"graft_topk_min(key, id, $k)").as("top"))
          .collect()
          .map { r =>
            r.getString(0) -> r.getSeq[Row](1).map(s => (s.getDouble(0), s.getLong(1)))
          }.toMap
        assert(got == expected, s"trial $trial parts $parts k $k")
      }
    }
    // −0.0 must tie with +0.0 (id decides), not sort before it — the
    // SQL-comparison semantics the oracle's ORDER BY also uses
    val zrows = Seq(Row("z", 0.0, 5L), Row("z", -0.0, 9L), Row("z", -1.0, 7L))
    val got = spark.createDataFrame(zrows.asJava, schema)
      .groupBy("g").agg(expr("graft_topk_min(key, id, 3)").as("top"))
      .collect().head.getSeq[Row](1).map(s => s.getLong(1))
    assert(got == Seq(7L, 5L, 9L), s"zero-tie ordering wrong: $got")
  }

  test("nulls ignored; k past the group returns the whole group ranked") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "g STRING, key BIGINT, id BIGINT")
    val rows = Seq(
      Row("a", 5L, 1L), Row("a", null, 2L), Row("a", 3L, null), Row("a", 4L, 9L))
    val got = spark.createDataFrame(rows.asJava, schema)
      .groupBy("g").agg(expr("graft_topk_min(key, id, 100)").as("top"))
      .collect().head.getSeq[Row](1).map(s => (s.getLong(0), s.getLong(1)))
    assert(got == Seq((4L, 9L), (5L, 1L)), s"got $got")
  }
}
