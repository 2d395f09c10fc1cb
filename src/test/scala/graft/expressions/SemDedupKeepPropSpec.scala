package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style equivalence: the fused per-cluster kernel must match
  * the brute-force SemDeDup definition — member j is dropped iff ANY
  * member with a smaller vec_id (dropped or not) has dot > 0 and
  * (10·dot)² ≥ (9·‖a‖²)·(9·‖b‖²) — on random clusters, including
  * negative coordinates (anti-parallel guards), zero vectors (nrm = 0:
  * dot = 0 fails the strict positivity test, so they always survive),
  * shuffled arrival orders, and magnitudes near the quantized scale.
  * 30 seeded random clusters, dimensions 1–8, sizes 0–40. */
class SemDedupKeepPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(members: Seq[(Long, Array[Long])]): Seq[Long] = {
    val sorted = members.sortBy(_._1)
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    sorted.zipWithIndex.foreach { case ((id, qj), j) =>
      val nj = qj.map(x => x * x).sum
      val dropped = sorted.take(j).exists { case (_, qa) =>
        val na = qa.map(x => x * x).sum
        val dot = qa.zip(qj).map { case (a, b) => a * b }.sum
        dot > 0 && MulGe.compute(10L * dot, 10L * dot, 9L * na, 9L * nj)
      }
      if (!dropped) kept += id
    }
    kept.toSeq
  }

  test("graft_semdedup_keep == brute force on random clusters") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, qu ARRAY<BIGINT>, nrm BIGINT")
    val rng = new scala.util.Random(15)
    (1 to 30).foreach { trial =>
      val dim = 1 + rng.nextInt(8)
      val m = rng.nextInt(41)
      // distinct ids, shuffled arrival order; a few exact copies to
      // guarantee drops occur
      val ids = rng.shuffle((0 until m).map(_.toLong * 3 + rng.nextInt(3)).distinct.toList)
      val members = ids.map { id =>
        val base = Array.fill(dim)((rng.nextInt(2001) - 1000).toLong *
          (if (rng.nextBoolean()) 1000L else 1L))
        id -> base
      }
      val withCopies = members ++ members.take(m / 4).map { case (id, q) =>
        (id + 1000000L, q.clone())
      }
      val rows = withCopies.map { case (id, q) =>
        Row(id, q.toSeq, q.map(x => x * x).sum)
      }
      val got = spark.createDataFrame(rows.asJava, schema)
        .agg(collect_list(struct(col("vec_id"), col("qu"), col("nrm"))).as("members"))
        .select(expr("graft_semdedup_keep(members)").as("kept"))
        .collect().head.getSeq[Long](0)
      val expected = brute(withCopies)
      assert(got == expected,
        s"trial $trial dim=$dim m=${withCopies.size}: got $got expected $expected")
    }
  }
}
